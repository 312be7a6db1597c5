"""Pipeline-knob sweep for the headline bench workload.

Runs the `bench.py` inference workload (flagship LFT 5x5 4x, 128^2 LR
scenes, bf16) across a grid of pipeline knobs -- scenes per dispatch
(`--scene_batch`) x patch-chunk size (`--eval_batch`) -- in ONE process,
interleaved round-robin so tunnel drift cancels (docs/PERFORMANCE.md
pitfall 2), and prints an MPx/s table plus the best config.

Kernel-geometry env knobs (LFT_HP_TILE / LFT_HP_KB / LFT_HP_VPS /
LFT_ANG_GPS) are trace-time and lru-cached, so they are swept in
SUBPROCESSES: `--env LFT_HP_VPS=2,4` forks one child per value with the
(first) scene_batch/eval_batch config and compares.

Usage:
  python tools/bench_sweep.py                         # default grid
  python tools/bench_sweep.py --scene_batch 2,4,8 --eval_batch 16,32
  python tools/bench_sweep.py --env LFT_HP_VPS=2,4,8
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _probe_device(timeout_s: int = 180) -> bool:
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True)
        return p.returncode == 0
    except Exception:
        return False


def _intlist(s):
    return [int(t) for t in s.split(",") if t]


def run_grid(ns):
    import jax
    import jax.numpy as jnp
    from lft_tpu.config import Args
    from lft_tpu.registry import get_model
    from lft_tpu.inference.tiled import make_scene_sr

    args = Args(angRes=5, scale_factor=4, channels=64, model_name="LFT",
                dtype=ns.dtype, attention_impl="auto")
    A, S = args.angRes, args.scale_factor
    h0 = w0 = ns.scene
    model = get_model(args)
    params = model.init(jax.random.PRNGKey(0), args)
    max_sb = max(ns.scene_batch)
    scenes = np.random.RandomState(0).rand(
        max_sb, A * h0, A * w0).astype(np.float32)

    def force(x):
        return float(jnp.sum(x))

    configs = list(itertools.product(ns.scene_batch, ns.eval_batch))
    fns = {}
    for sb, eb in configs:
        sc = jnp.asarray(scenes[:sb] if sb > 1 else scenes[0])
        fn = make_scene_sr(model.apply, args, h0, w0, eval_batch=eb,
                           n_scenes=sb)
        force(fn(params, sc))                    # compile + warm
        fns[(sb, eb)] = (fn, sc, sb * (A * h0 * S) * (A * w0 * S) / 1e6)
        print(f"compiled scene_batch={sb} eval_batch={eb}", file=sys.stderr)

    # interleaved timing: reps rounds, each visiting every config once
    totals = {c: 0.0 for c in configs}
    for _ in range(ns.reps):
        for c in configs:
            fn, sc, _ = fns[c]
            t0 = time.perf_counter()
            force(fn(params, sc))
            totals[c] += time.perf_counter() - t0

    rows = []
    for c in configs:
        _, _, mpx = fns[c]
        dt = totals[c] / ns.reps
        rows.append({"scene_batch": c[0], "eval_batch": c[1],
                     "mpx_per_s": round(mpx / dt, 3),
                     "sec_per_dispatch": round(dt, 4)})
    rows.sort(key=lambda r: -r["mpx_per_s"])
    for r in rows:
        print(json.dumps(r))
    best = rows[0]
    print(json.dumps({"best": best}))
    return best


def run_envsweep(ns):
    key, _, vals = ns.env.partition("=")
    results = []
    for v in vals.split(","):
        env = dict(os.environ)
        env[key] = v
        cmd = [sys.executable, os.path.abspath(__file__),
               "--scene_batch", str(ns.scene_batch[0]),
               "--eval_batch", str(ns.eval_batch[0]),
               "--scene", str(ns.scene), "--reps", str(ns.reps),
               "--dtype", ns.dtype]
        p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=1800)
        best = None
        for line in p.stdout.splitlines():
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "best" in d:
                best = d["best"]
        results.append({key: v, "best": best, "rc": p.returncode})
        print(json.dumps(results[-1]))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_batch", type=_intlist, default=[2, 4, 8])
    ap.add_argument("--eval_batch", type=_intlist, default=[16, 32])
    ap.add_argument("--scene", type=int, default=128)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--env", default="",
                    help="KEY=v1,v2,... subprocess sweep of one env knob")
    ns = ap.parse_args()

    if not _probe_device():
        print("bench_sweep: device backend did not initialize (tunnel "
              "unhealthy?) -- refusing to hang", file=sys.stderr)
        sys.exit(2)
    if ns.env:
        run_envsweep(ns)
    else:
        run_grid(ns)


if __name__ == "__main__":
    main()
