"""Train-step kernel-knob sweep (subprocess-per-config).

Times ONLY the production jitted train step (bench.py's train section:
flagship LFT 5x5, channels=64, batch 8, 2x, 32^2 LR patches, fused-VJP
kernels, on-device metrics) under different kernel env knobs. Each knob
value runs in its own subprocess because the knobs are trace-time and
module-level (LFT_ANG_GPS is read at import, spa_attn_hp geometry is
lru-cached).

Cross-process runs on the tunneled chip carry +-0.2 MPx/s-equivalent
drift (docs/PERFORMANCE.md pitfall 5), so each config is measured with
`--reps` timed steps after a warmup step, and the table should only
drive decisions on >2% deltas.

Usage:
  python tools/bench_train_knobs.py                       # default grid
  python tools/bench_train_knobs.py --env LFT_HP_VPS=1,2,4
  python tools/bench_train_knobs.py --env LFT_ANG_GPS=8,16 --reps 20
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time
sys.path.insert(0, %(repo)r)
import jax
from jax import random
from lft_tpu.config import Args
from lft_tpu.registry import get_model
from lft_tpu.data.device_synth import synth_batch
from lft_tpu.training.optim import make_optimizer
from lft_tpu.training.trainer import make_train_step

args = Args(angRes=5, scale_factor=2, channels=64, batch_size=8,
            dtype="bfloat16", attention_impl="auto")
model = get_model(args)
params = model.init(random.PRNGKey(0), args)
optimizer = make_optimizer(args, steps_per_epoch=100)
opt_state = optimizer.init(params)
step = make_train_step(model, optimizer, args, with_metrics=True)
lr_b, hr_b = synth_batch(random.PRNGKey(1), batch=8, ang_res=5,
                         patch=32, scale=2)
params, opt_state, aux = step(params, opt_state, lr_b, hr_b)
float(aux["loss"])                                  # compile + warm
t0 = time.perf_counter()
for _ in range(%(reps)d):
    params, opt_state, aux = step(params, opt_state, lr_b, hr_b)
    float(aux["loss"])
print("TRAIN_MS %%0.2f" %% ((time.perf_counter() - t0) / %(reps)d * 1e3))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", action="append", default=[],
                    help="KNOB=v1,v2,... (one subprocess per value); "
                         "repeatable. Default grid: LFT_HP_VPS=1,2 and "
                         "LFT_ANG_GPS=8,16,32")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--timeout", type=int, default=420)
    ns = ap.parse_args()

    sweeps = []
    for spec in (ns.env or ["LFT_HP_VPS=1,2", "LFT_ANG_GPS=8,16,32"]):
        knob, _, vals = spec.partition("=")
        sweeps.append((knob, [v for v in vals.split(",") if v]))

    child = _CHILD % {"repo": REPO, "reps": ns.reps}
    results = []
    # One unmodified-env baseline first, then each knob value.
    for knob, val in [(None, None)] + [(k, v) for k, vs in sweeps
                                       for v in vs]:
        env = dict(os.environ)
        if knob is not None:
            env[knob] = val
        tag = "default" if knob is None else f"{knob}={val}"
        try:
            p = subprocess.run([sys.executable, "-c", child], env=env,
                               capture_output=True, text=True,
                               timeout=ns.timeout)
        except subprocess.TimeoutExpired:
            print(f"{tag:24s} TIMEOUT")
            continue
        ms = [l.split()[1] for l in p.stdout.splitlines()
              if l.startswith("TRAIN_MS")]
        if p.returncode != 0 or not ms:
            tail = (p.stderr or p.stdout).strip().splitlines()[-1:]
            print(f"{tag:24s} FAILED  {tail}")
            continue
        print(f"{tag:24s} {float(ms[0]):8.1f} ms/step")
        results.append((tag, float(ms[0])))

    if results:
        best = min(results, key=lambda r: r[1])
        print(f"\nbest: {best[0]} @ {best[1]:.1f} ms/step")


if __name__ == "__main__":
    main()
