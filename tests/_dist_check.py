"""Subprocess bodies for test_multihost_training_matches_single_process:
the multi-host entry (--coordinator / --num_processes / --process_id,
lft_tpu/parallel/distributed.py) must reproduce single-process DP
training numerics over the same global 4-device mesh.

Modes (argv[1]):
  worker <port> <pid> <data_root> <out_root>   one of 2 processes, 2 local
                                               virtual CPU devices each
  single <data_root> <out_root>                1 process, 4 virtual devices

Both run the SAME train-CLI fit (1 epoch, global batch 4) on the same
synthetic h5 data and write the epoch checkpoint; the parent compares
the two checkpoints.  Run standalone:
    python tests/_dist_check.py single /tmp/data /tmp/out
"""

import os
import sys

N_LOCAL = {"worker": 2, "single": 4}[sys.argv[1]]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_LOCAL}")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

from lft_tpu.config import Args  # noqa: E402
import train as train_cli  # noqa: E402


def base_args(data_root, log_root, **kw):
    # the paths dict make_synth_data(data_root, dataset_name="SynthLF")
    # returned to the parent, reconstructed (the data already exists)
    paths = {"path_for_train": os.path.join(data_root, "data_for_train")
             + os.sep,
             "path_for_test": os.path.join(data_root, "data_for_test")
             + os.sep,
             "data_name": "SynthLF"}
    return Args(angRes=5, scale_factor=2, channels=8, batch_size=4,
                num_workers=0, epoch=1, num_devices=4, seed=0,
                matmul_precision="highest",
                path_for_train=paths["path_for_train"],
                path_for_test=paths["path_for_test"],
                data_name=paths["data_name"],
                path_log=log_root + "/", **kw)


def main():
    mode = sys.argv[1]
    if mode == "worker":
        port, pid, data_root, out_root = (
            sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5])
        args = base_args(data_root, os.path.join(out_root, f"p{pid}"),
                         coordinator=f"localhost:{port}",
                         num_processes=2, process_id=pid)
    else:
        data_root, out_root = sys.argv[2], sys.argv[3]
        args = base_args(data_root, os.path.join(out_root, "single"))
    params, history = train_cli.main(args)
    print(f"{mode} loss {history[0]['loss']:.6f}")


if __name__ == "__main__":
    main()
