"""Train a demo checkpoint on the on-device synthetic stream and evaluate
it through the standard `test.py` pipeline.

Produces the `examples/synth_demo` artifacts: a full-width (channels=64)
LFT model trained end-to-end on one TPU chip with the fused trainable
Pallas kernels (bf16), saved in BOTH formats (.npz native, .pth loadable
by the reference PyTorch implementation unchanged), plus a bicubic-
baseline comparison on held-out synthetic scenes (the published EPFL/HCI
`.mat` scenes are not available in this environment).

Usage:
  python tools/train_demo.py --scale 4 --steps 1500 --batch 4 \
      --out examples/synth_demo
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--patch", type=int, default=32, help="LR patch size")
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="examples/synth_demo")
    ap.add_argument("--data_root", default="", help="eval data root "
                    "(created if empty)")
    ap.add_argument("--log_every", type=int, default=100)
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lft_tpu.config import Args
    from lft_tpu.registry import get_model
    from lft_tpu.data.device_synth import synth_batch
    from lft_tpu.training.optim import make_optimizer
    from lft_tpu.training.trainer import make_train_step
    from lft_tpu.utils.checkpoint import params_to_pth, save_checkpoint

    args = Args(angRes=5, scale_factor=ns.scale, channels=ns.channels,
                batch_size=ns.batch, lr=ns.lr, dtype=ns.dtype,
                lr_schedule="cosine",
                epoch=max(ns.steps // 100, 1))  # cosine horizon in "epochs"
    model = get_model(args)
    params = model.init(jax.random.PRNGKey(0), args)
    optimizer = make_optimizer(args, steps_per_epoch=100)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, args, with_metrics=True)

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(ns.steps):
        key, sub = jax.random.split(key)
        lr_b, hr_b = synth_batch(sub, batch=ns.batch, ang_res=5,
                                 patch=ns.patch, scale=ns.scale)
        params, opt_state, aux = step(params, opt_state, lr_b, hr_b)
        if (i + 1) % ns.log_every == 0 or i == 0:
            print(f"step {i + 1:5d}/{ns.steps}  loss {float(aux['loss']):.5f}"
                  f"  psnr {float(aux['psnr']):.2f}"
                  f"  [{time.time() - t0:.0f}s]", flush=True)
    train_s = time.time() - t0
    print(f"trained {ns.steps} steps x batch {ns.batch} in {train_s:.0f}s "
          f"({train_s / ns.steps * 1e3:.0f} ms/step incl. data gen)")

    os.makedirs(ns.out, exist_ok=True)
    stem = f"LFT_5x5_{ns.scale}x_synth{ns.steps}"
    np_params = {k: np.asarray(v) for k, v in params.items()}
    npz_path = os.path.join(ns.out, stem + ".npz")
    save_checkpoint(npz_path, np_params, epoch=args.epoch)
    try:
        params_to_pth(np_params, os.path.join(ns.out, stem + ".pth"),
                      epoch=args.epoch)
    except ImportError:
        print("torch unavailable; skipped .pth export")
    print("saved", npz_path)

    # --- evaluation through the standard test.py pipeline -------------------
    from lft_tpu.data.synth import make_synth_data
    import test as test_cli
    root = ns.data_root or os.path.join(ns.out, "_eval_data")
    paths = make_synth_data(root, ang_res=5, scale=ns.scale, n_train=0,
                            n_test=2, test_hw=64, seed=7)
    eval_args = Args(angRes=5, scale_factor=ns.scale, channels=ns.channels,
                     dtype=ns.dtype, use_pre_pth=True, path_pre_pth=npz_path,
                     path_for_test=paths["path_for_test"],
                     data_name=paths["data_name"],
                     path_log=os.path.join(ns.out, "_eval_log") + os.sep)
    psnrs, ssims = test_cli.main(eval_args)

    # bicubic baseline: the model's skip path alone on the same scenes
    from lft_tpu.data.datasets import multi_test_sets
    from lft_tpu.ops.bicubic import bicubic_upscale_views
    from lft_tpu.ops.metrics import cal_metrics
    _, sets, _ = multi_test_sets(eval_args)
    bp, bs = [], []
    up = jax.jit(lambda x: bicubic_upscale_views(x[None], 5, ns.scale)[0])
    for i in range(len(sets[0])):
        lr_m, hr_m = sets[0][i]
        sr = up(jnp.asarray(lr_m))
        p, s = cal_metrics(jnp.asarray(hr_m), sr, 5)
        bp.append(float(p))
        bs.append(float(s))
    result = {
        "scale": ns.scale, "steps": ns.steps, "batch": ns.batch,
        "train_seconds": round(train_s, 1),
        "model_psnr": round(float(np.mean(psnrs)), 2),
        "model_ssim": round(float(np.mean(ssims)), 4),
        "bicubic_psnr": round(float(np.mean(bp)), 2),
        "bicubic_ssim": round(float(np.mean(bs)), 4),
    }
    print(json.dumps(result))
    with open(os.path.join(ns.out, stem + "_eval.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
