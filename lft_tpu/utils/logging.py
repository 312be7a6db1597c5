"""Experiment directories and logging.

Parity with reference utils/utils.py:10-51: `create_dir` builds
`<path_log>/SR_{A}x{A}_{S}x/{model}/{data}/{checkpoints,logs}`, `Logger`
writes to `<log_dir>/<model_name>.txt` and mirrors to stdout, gated on
`local_rank <= 0`. Unlike the reference, the rank gate uses the Logger's own
args (no import-time global argparse coupling).
"""

from __future__ import annotations

import logging
from pathlib import Path


def get_logger(log_dir, args) -> logging.Logger:
    logger = logging.getLogger(f"{args.model_name}@{log_dir}")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        formatter = logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        fh = logging.FileHandler("%s/%s.txt" % (log_dir, args.model_name))
        fh.setLevel(logging.INFO)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


def create_dir(args):
    """Returns (experiment_dir, checkpoints_dir, log_dir), creating them
    (reference utils/utils.py:23-41)."""
    experiment_dir = Path(args.path_log)
    experiment_dir.mkdir(exist_ok=True, parents=True)
    task_path = "SR_" + str(args.angRes) + "x" + str(args.angRes) + "_" + \
        str(args.scale_factor) + "x"
    experiment_dir = experiment_dir / task_path / args.model_name / args.data_name
    experiment_dir.mkdir(exist_ok=True, parents=True)
    checkpoints_dir = experiment_dir / "checkpoints"
    checkpoints_dir.mkdir(exist_ok=True)
    log_dir = experiment_dir / "logs"
    log_dir.mkdir(exist_ok=True)
    return experiment_dir, checkpoints_dir, log_dir


class Logger:
    """File + stdout logger gated on local_rank <= 0
    (reference utils/utils.py:44-51)."""

    def __init__(self, log_dir, args):
        self.args = args
        self.logger = get_logger(log_dir, args)

    def log_string(self, s: str):
        if getattr(self.args, "local_rank", 0) <= 0:
            self.logger.info(s)
            print(s)
