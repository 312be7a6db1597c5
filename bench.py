"""Benchmark: full-scene 5x5 4x LF super-resolution throughput per chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Workload (BASELINE.json north-star): tiled inference of a synthetic
5x5-view scene (128x128 LR per view -> 512x512 HR per view) through the
flagship LFT model (64 channels, 4x), i.e. LFdivide -> batched network ->
LFintegrate producing 5*512 x 5*512 = 6.55 HR SAI-megapixels per scene.

`value` = steady-state HR SAI-megapixels/second on one chip with the
TPU-native pipeline (one jit region, batched patches, fused Pallas
local-window + angular attention kernels, bf16 compute by default).

`vs_baseline` = value / baseline_value, where the baseline is the
REFERENCE'S EXECUTION STRATEGY run on the same chip: serial batch-1 patch
loop with one device dispatch + sync per patch (reference test.py:88-95),
f32, XLA attention. Same hardware, same model, same scene -- the ratio
isolates the framework design. (--baseline_impl dense additionally uses
the reference's dense O((hw)^2) attention mask, model/LFT.py:147-177;
per-patch runtime is nearly identical but its compile alone takes ~4.5
minutes on TPU, so 'tiled' is the default baseline attention.)
(The reference publishes no wall-clock numbers to compare against,
SURVEY.md §6; its repo as shipped even runs on CPU, reference test.py:20.)

Usage: python bench.py [--quick] [--dtype float32|bfloat16] [--impl auto|...]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _probe_device(timeout_s: int = 180) -> bool:
    """Backend init talks to the tunneled TPU and can hang forever when the
    tunnel is unhealthy; probe it in a bounded subprocess so a dead tunnel
    yields a fast, clear failure instead of a hung bench."""
    import subprocess
    import sys
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True)
        return p.returncode == 0
    except Exception:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer reps")
    ap.add_argument("--dtype", default="mixed",
                    choices=["float32", "bfloat16", "mixed"],
                    help="mixed (shipping): f32 activations/residuals, "
                         "bf16 matmul operands in the fused kernels -- "
                         "full MXU rate, passes the 0.01 dB quality gate "
                         "(PARITY_bf16.json); all-bf16 measured -0.20 dB")
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "dense", "tiled", "pallas"])
    ap.add_argument("--scene", type=int, default=128, help="LR view size")
    ap.add_argument("--eval_batch", type=int, default=16)
    ap.add_argument("--scene_batch", type=int, default=8,
                    help="scenes per jit dispatch (amortizes the ~29 ms "
                         "tunneled-device dispatch overhead; the eval "
                         "pipeline's ScenePipelineCache(scene_batch=N) "
                         "capability)")
    ap.add_argument("--skip_baseline", action="store_true")
    ap.add_argument("--baseline_impl", default="tiled",
                    choices=["dense", "tiled"])
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--train_batch", type=int, default=8)
    ap.add_argument("--train_scale", type=int, default=2)
    ap.add_argument("--train_patch", type=int, default=32, help="LR patch")
    ap.add_argument("--train_remat", type=lambda s: s.lower() not in
                    ("false", "0", "no"), default=True,
                    help="block rematerialization in the train step "
                         "(False = fewer backward FLOPs, more HBM)")
    ns = ap.parse_args()

    if not _probe_device():
        import sys
        print("bench.py: device backend did not initialize within the probe "
              "timeout (TPU tunnel unhealthy?) -- refusing to hang",
              file=sys.stderr)
        sys.exit(2)

    import jax
    # persistent XLA compilation cache: the bench's f32 baseline-leg
    # compile alone takes ~6-7 min of host CPU on this 1-core box; cache
    # it across bench invocations so only the first run pays
    cache_dir = os.environ.get(
        "LFT_XLA_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".xla_cache"))
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from lft_tpu.config import Args
    from lft_tpu.registry import get_model
    from lft_tpu.inference.tiled import make_scene_sr

    args = Args(angRes=5, scale_factor=4, channels=64, model_name="LFT",
                dtype=ns.dtype, attention_impl=ns.impl,
                eval_batch=ns.eval_batch)
    A, S = args.angRes, args.scale_factor
    h0 = w0 = ns.scene
    model = get_model(args)
    params = model.init(jax.random.PRNGKey(0), args)
    nsc = max(ns.scene_batch, 1)
    scenes = np.random.RandomState(0).rand(
        nsc, A * h0, A * w0).astype(np.float32)
    scene_j = jnp.asarray(scenes if nsc > 1 else scenes[0])
    out_mpx = nsc * (A * h0 * S) * (A * w0 * S) / 1e6

    def force(x):
        """Force completion with a 4-byte D2H fetch. (On the tunneled axon
        platform block_until_ready can return early and full-array transfers
        are extremely slow, so scalar-fetch is the only reliable fence.)"""
        return float(jnp.sum(x))

    # --- TPU-native pipeline -------------------------------------------------
    sr_fn = make_scene_sr(model.apply, args, h0, w0, eval_batch=ns.eval_batch,
                          n_scenes=nsc)
    force(sr_fn(params, scene_j))               # compile + warm
    reps = 2 if ns.quick else 5
    t0 = time.perf_counter()
    for _ in range(reps):
        force(sr_fn(params, scene_j))
    dt = (time.perf_counter() - t0) / reps
    value = out_mpx / dt

    # --- reference-strategy baseline: serial batch-1 patches, dense mask ----
    vs_baseline = float("nan")
    if not ns.skip_baseline:
        from lft_tpu.ops.tiling import lf_divide, lf_integrate
        patch, stride = args.patch_size_for_test, args.stride_for_test
        base_args = Args(angRes=5, scale_factor=4, channels=64,
                         attention_impl=ns.baseline_impl, dtype="float32")
        fwd1 = jax.jit(lambda p, x: model.apply(p, x, base_args))
        sub = lf_divide(scene_j[0] if nsc > 1 else scene_j, A, patch, stride)
        nU, nV = sub.shape[0], sub.shape[1]
        force(fwd1(params, sub[0, 0][None, None]))  # compile
        t0 = time.perf_counter()
        for u in range(nU):                     # serial, batch 1, one
            for v in range(nV):                 # dispatch + sync per patch,
                force(fwd1(params, sub[u, v][None, None]))  # like test.py:88-95
        base_dt = time.perf_counter() - t0
        base_value = (out_mpx / nsc) / base_dt  # baseline runs ONE scene
        vs_baseline = value / base_value

    # --- training throughput: the production jitted step (fused-VJP path) ---
    # Half the framework's story is the train loop it replaces (reference
    # train.py:111-138, which stalls per-iteration on CPU skimage metrics);
    # ours keeps metrics on-device inside the step.
    train_detail = None
    if not ns.skip_train:
        from lft_tpu.data.device_synth import synth_batch
        from lft_tpu.training.optim import make_optimizer
        from lft_tpu.training.trainer import make_train_step
        targs = Args(angRes=5, scale_factor=ns.train_scale, channels=64,
                     batch_size=ns.train_batch, dtype=ns.dtype,
                     attention_impl=ns.impl, train_remat=ns.train_remat)
        tmodel = get_model(targs)
        tparams = tmodel.init(jax.random.PRNGKey(0), targs)
        optimizer = make_optimizer(targs, steps_per_epoch=100)
        opt_state = optimizer.init(tparams)
        step = make_train_step(tmodel, optimizer, targs, with_metrics=True)
        lr_b, hr_b = synth_batch(jax.random.PRNGKey(1), batch=ns.train_batch,
                                 ang_res=5, patch=ns.train_patch,
                                 scale=ns.train_scale)
        tparams, opt_state, aux = step(tparams, opt_state, lr_b, hr_b)
        force(aux["loss"])                      # compile + warm
        treps = 3 if ns.quick else 10
        # steady-state: steps chain through (params, opt_state) on device
        # exactly like trainer.train_epoch (which only fetches metrics at
        # epoch end), so no per-step host sync -- fence ONCE at the end.
        # Fencing per step measured +25 ms/step of pure tunnel round-trip.
        t0 = time.perf_counter()
        for _ in range(treps):
            tparams, opt_state, aux = step(tparams, opt_state, lr_b, hr_b)
        force(aux["loss"])
        train_ms = (time.perf_counter() - t0) / treps * 1e3
        train_detail = {
            "train_ms_per_step": round(train_ms, 1),
            "train_samples_per_s": round(ns.train_batch / (train_ms / 1e3), 2),
            "train_batch": ns.train_batch, "train_scale": ns.train_scale,
            "train_lr_patch": ns.train_patch,
            "on_device_metrics": True,
        }

    # quality leash on the headline number: the shipping-config accuracy
    # vs the f32-exact path, from the committed tools/parity_bf16.py
    # artifact. The gate FAILS the bench (nonzero exit) on a recorded
    # regression or a stale artifact -- but only AFTER printing the JSON
    # line, so the measurement is never swallowed (VERDICT round-4 item 2).
    quality = None
    gate_fail = None
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "PARITY_bf16.json")
    if os.path.exists(art):
        with open(art) as f:
            q = json.load(f)
        from lft_tpu.utils.srchash import shipping_source_hash
        from lft_tpu.kernels.common import mm_hp_sites
        stale = ((q.get("source_hash") or "") != shipping_source_hash()
                 # the artifact is also stale if the mixed-mode matmul
                 # site plan differs from what this process would trace
                 or (q.get("mm_hp_sites") is not None
                     and q["mm_hp_sites"] != sorted(mm_hp_sites())))
        quality = {"psnr_delta_vs_f32": q["delta"]["psnr_mean"],
                   "ssim_delta_vs_f32": q["delta"]["ssim_mean"],
                   "ok": bool(q["ok"]) and not stale, "stale": stale,
                   "source": "PARITY_bf16.json"}
        if stale:
            gate_fail = ("PARITY_bf16.json was measured on different "
                         "kernel/model sources (source_hash mismatch) -- "
                         "re-run tools/parity_bf16.py")
        elif not q["ok"]:
            gate_fail = ("shipping-config quality regression recorded in "
                         "PARITY_bf16.json -- fix, then re-run "
                         "tools/parity_bf16.py")

    print(json.dumps({
        "metric": "LFT 5x5 4x full-scene SR throughput (HR SAI-MPx/s/chip)",
        "value": round(value, 3),
        "unit": "SAI-MPx/s/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline == vs_baseline else None,
        "detail": {
            "scene_lr_view": [h0, w0],
            "scene_batch": nsc,
            "out_mpx_per_dispatch": round(out_mpx, 3),
            "sec_per_scene": round(dt, 4),
            "dtype": ns.dtype, "impl": ns.impl,
            "eval_batch": ns.eval_batch,
            "baseline": "reference execution strategy on same chip: "
                        f"serial batch-1 patch loop, {ns.baseline_impl} attn",
            "device": str(jax.devices()[0]),
            "train": train_detail,
            "quality": quality,
        },
    }))
    if gate_fail:
        import sys
        print("bench.py QUALITY GATE FAILED: " + gate_fail, file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
