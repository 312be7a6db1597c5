"""Cross-implementation quality-parity harness (VERDICT.md round-1 #2).

Runs BOTH full evaluation pipelines on the same scenes with the same weights
and compares dataset-level PSNR/SSIM:

* the reference's own `test()` — LFdivide -> serial batch-1 torch forwards
  -> LFintegrate -> cal_metrics (reference test.py:73-111,
  utils/utils.py:56-157) — via tools/_ref_eval_driver.py in a subprocess;
* lft_tpu's `test.py` CLI — the one-jit tiled pipeline + on-device metrics.

The north-star bar (BASELINE.json): |dPSNR| <= 0.01 dB, |dSSIM| <= 1e-4.

    python tools/parity_eval.py                 # demo ckpt, synthetic scenes
    python tools/parity_eval.py --channels 16 --test_hw 32 --n_scenes 1
    python tools/parity_eval.py --ckpt my.npz --scale 2 --json out.json

With no --ckpt, uses the trained demo checkpoint (examples/synth_demo) when
the config matches it, else random-init weights (parity must hold for any
weights). Scenes are synthetic (the published datasets' .mat sources and
checkpoints are not in this environment); the pipelines under test are the
full production paths either way.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEMO_CKPT = os.path.join(REPO, "examples", "synth_demo",
                         "LFT_5x5_2x_synth1200.pth")


def run_reference(ref_root, ckpt_pth, data_root, args):
    flags = ["--angRes", str(args.angRes), "--scale_factor", str(args.scale_factor),
             "--channels", str(args.channels), "--model_name", "LFT",
             "--patch_size_for_test", str(args.patch_size_for_test),
             "--stride_for_test", str(args.stride_for_test),
             "--path_for_test", data_root, "--num_workers", "0"]
    cmd = [sys.executable, os.path.join(REPO, "tools", "_ref_eval_driver.py"),
           ref_root, ckpt_pth] + flags
    env = dict(os.environ)
    res = subprocess.run(cmd, capture_output=True, text=True, env=env)
    if res.returncode != 0:
        raise RuntimeError("reference eval failed:\n" + res.stdout + res.stderr)
    out = {}
    for line in res.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            out[d["dataset"]] = (d["psnr"], d["ssim"])
    return out


def run_lft_tpu(ckpt, data_root, log_root, args):
    import test as test_cli
    from lft_tpu.config import Args
    a = Args(angRes=args.angRes, scale_factor=args.scale_factor,
             channels=args.channels, use_pre_pth=True, path_pre_pth=ckpt,
             path_for_test=data_root, path_log=log_root + os.sep,
             patch_size_for_test=args.patch_size_for_test,
             stride_for_test=args.stride_for_test,
             platform=args.platform, matmul_precision="highest",
             attention_impl=args.attention_impl, eval_batch=args.eval_batch)
    from lft_tpu.data.datasets import multi_test_sets
    names, _, _ = multi_test_sets(a)
    psnrs, ssims = test_cli.main(a)
    return {n: (p, s) for n, p, s in zip(names, psnrs, ssims)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--ckpt", default=None,
                    help=".npz or .pth weights (default: demo ckpt if config "
                         "matches, else random init)")
    ap.add_argument("--angRes", type=int, default=5)
    ap.add_argument("--scale_factor", "--scale", type=int, default=2)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--patch_size_for_test", type=int, default=32)
    ap.add_argument("--stride_for_test", type=int, default=16)
    ap.add_argument("--n_scenes", type=int, default=2)
    ap.add_argument("--test_hw", type=int, default=64,
                    help="LR view size of the synthetic test scenes")
    ap.add_argument("--platform", default="cpu",
                    help="jax backend for the lft_tpu side (cpu = exact-f32 "
                         "apples-to-apples with torch cpu)")
    ap.add_argument("--attention_impl", default="auto")
    ap.add_argument("--eval_batch", type=int, default=16)
    ap.add_argument("--psnr_tol", type=float, default=0.01)
    ap.add_argument("--ssim_tol", type=float, default=1e-4)
    ap.add_argument("--json", default=None, help="write results JSON here")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args(argv)

    work = args.workdir or tempfile.mkdtemp(prefix="parity_eval_")
    os.makedirs(work, exist_ok=True)

    from lft_tpu.data.synth import make_synth_data
    paths = make_synth_data(os.path.join(work, "data"), ang_res=args.angRes,
                            scale=args.scale_factor, n_train=0,
                            n_test=args.n_scenes, test_hw=args.test_hw,
                            dataset_name="SynthParity")
    data_root = paths["path_for_test"]

    # --- weights: one .pth + .npz pair both sides load --------------------
    from lft_tpu.utils.checkpoint import (load_checkpoint, params_to_pth,
                                          pth_to_params, save_checkpoint)
    ckpt = args.ckpt
    if ckpt is None and args.scale_factor == 2 and args.channels == 64 \
            and os.path.exists(DEMO_CKPT):
        ckpt = DEMO_CKPT
        print(f"using demo checkpoint {ckpt}")
    if ckpt is None:
        import jax
        if args.platform:
            # pin BEFORE the first backend use: init_params below would
            # otherwise initialize the default (tunneled-TPU) backend --
            # hanging on an unhealthy tunnel and making the later in-driver
            # pin a no-op (backends are process-wide once initialized)
            jax.config.update("jax_platforms", args.platform)
        from lft_tpu.config import Args
        from lft_tpu.models import lft
        p = lft.init_params(jax.random.PRNGKey(0),
                            Args(angRes=args.angRes,
                                 scale_factor=args.scale_factor,
                                 channels=args.channels))
        p = {k: np.asarray(v) for k, v in p.items()}
        ckpt = os.path.join(work, "random_init.npz")
        save_checkpoint(ckpt, p, epoch=0)
        print("using random-init weights (parity holds for any weights)")
    if ckpt.endswith(".npz"):
        params, epoch, _ = load_checkpoint(ckpt)
        pth = os.path.join(work, "weights.pth")
        params_to_pth(params, pth, epoch=epoch)
    else:
        pth = ckpt

    # --- both pipelines ----------------------------------------------------
    print("running lft_tpu tiled pipeline ...")
    ours = run_lft_tpu(ckpt, data_root, os.path.join(work, "log"), args)
    print("running reference pipeline (torch cpu, serial patch loop) ...")
    ref = run_reference(args.reference, pth, data_root, args)

    # --- compare ------------------------------------------------------------
    rows, ok = [], True
    for name in sorted(ref):
        rp, rs = ref[name]
        op, osim = ours[name]
        dp, ds = abs(op - rp), abs(osim - rs)
        good = dp <= args.psnr_tol and ds <= args.ssim_tol
        ok &= good
        rows.append({"dataset": name, "ref_psnr": rp, "ref_ssim": rs,
                     "lft_tpu_psnr": op, "lft_tpu_ssim": osim,
                     "dpsnr": op - rp, "dssim": osim - rs, "ok": good})
        print(f"{name}: reference {rp:.4f}/{rs:.5f}  lft_tpu {op:.4f}/{osim:.5f}"
              f"  d {op - rp:+.4f}/{osim - rs:+.6f}  "
              f"{'OK' if good else 'FAIL'}")
    verdict = ("PARITY OK" if ok else "PARITY FAIL") + \
        f" (|dPSNR|<={args.psnr_tol} dB, |dSSIM|<={args.ssim_tol})"
    print(verdict)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"rows": rows, "ok": ok,
                       "config": {k: getattr(args, k) for k in
                                  ("angRes", "scale_factor", "channels",
                                   "patch_size_for_test", "stride_for_test",
                                   "n_scenes", "test_hw")},
                       "ckpt": ckpt}, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
