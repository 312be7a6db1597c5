"""Measure the train step's forward vs backward split on the current chip.

Times three jitted functions at the bench config (batch 8, 2x, patch 32):
  fwd        loss only (inference-grade forward, remat irrelevant)
  grad       value_and_grad (forward + backward, remat per --remat)
  step       the full production train step (grad + Adam + on-device metrics)

Prints one JSON line. Used to target kernel work: the gap (grad - fwd) is
the backward (+ remat recompute) cost the fused-block VJPs must attack.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, *a, reps=10):
    out = fn(*a)
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x)) if hasattr(x, "dtype") else x,
        out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    # scalar-fetch fence (see bench.py force())
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    float(jnp.sum(leaves[0]))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--patch", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat", type=lambda s: s.lower() not in
                    ("false", "0", "no"), default=True)
    ap.add_argument("--train_fused", default=None,
                    choices=("auto", "true", "false"),
                    help="force the fused-block train path on/off")
    ns = ap.parse_args()

    from lft_tpu.config import Args
    from lft_tpu.data.device_synth import synth_batch
    from lft_tpu.registry import get_model
    from lft_tpu.training.optim import make_optimizer
    from lft_tpu.training.trainer import make_train_step

    kw = {}
    if ns.train_fused is not None:
        kw["train_fused"] = ns.train_fused
    args = Args(angRes=5, scale_factor=ns.scale, channels=64,
                batch_size=ns.batch, dtype=ns.dtype, train_remat=ns.remat,
                **kw)
    model = get_model(args)
    params = model.init(jax.random.PRNGKey(0), args)
    lr_b, hr_b = synth_batch(jax.random.PRNGKey(1), batch=ns.batch,
                             ang_res=5, patch=ns.patch, scale=ns.scale)

    # mirror make_train_step's train_fused resolution so fwd/grad measure
    # the same path the production step runs
    tf = str(args.train_fused).lower()
    fused = (jax.devices()[0].platform == "tpu" and ns.dtype == "bfloat16") \
        if tf == "auto" else tf in ("true", "1", "yes")
    remat = False if fused else args.train_remat

    def loss_fn(p, data, label):
        sr = model.apply(p, data, args, remat=remat, fused=fused)
        return model.loss(sr, label)

    fwd = jax.jit(loss_fn)
    grad = jax.jit(jax.value_and_grad(loss_fn))
    optimizer = make_optimizer(args, steps_per_epoch=100)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, args, with_metrics=True)

    t_fwd = bench(fwd, params, lr_b, hr_b)
    t_grad = bench(grad, params, lr_b, hr_b)

    # the production step donates (params, opt_state) -- thread them through
    p, o = params, opt_state
    p, o, aux = step(p, o, lr_b, hr_b)
    float(aux["loss"])
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        p, o, aux = step(p, o, lr_b, hr_b)
    float(aux["loss"])
    t_step = (time.perf_counter() - t0) / reps * 1e3

    print(json.dumps({
        "fwd_ms": round(t_fwd, 1),
        "grad_ms": round(t_grad, 1),
        "bwd_plus_recompute_ms": round(t_grad - t_fwd, 1),
        "step_ms": round(t_step, 1),
        "overhead_ms": round(t_step - t_grad, 1),
        "batch": ns.batch, "scale": ns.scale, "patch": ns.patch,
        "dtype": ns.dtype, "remat": ns.remat,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
