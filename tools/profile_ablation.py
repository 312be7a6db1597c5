"""Ablation timer: locate where full-scene SR time goes on the device.

Times the flagship tiled-inference pipeline (bench.py workload) with parts
of the model disabled, plus isolated jitted components, so perf work
targets the measured bottleneck instead of the assumed one.

Usage: python tools/profile_ablation.py [--scene 128] [--eval_batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, default=128)
    ap.add_argument("--eval_batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=3)
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lft_tpu.config import Args
    from lft_tpu.registry import get_model
    from lft_tpu.inference.tiled import make_scene_sr
    from lft_tpu.models import lft as lft_mod

    args = Args(angRes=5, scale_factor=4, channels=64, model_name="LFT",
                dtype=ns.dtype, eval_batch=ns.eval_batch)
    A, S = args.angRes, args.scale_factor
    h0 = w0 = ns.scene
    model = get_model(args)
    params = model.init(jax.random.PRNGKey(0), args)
    scene = jnp.asarray(
        np.random.RandomState(0).rand(A * h0, A * w0).astype(np.float32))

    def force(x):
        return float(jnp.sum(x))

    def timeit(name, fn, *a):
        force(fn(*a))
        t0 = time.perf_counter()
        for _ in range(ns.reps):
            force(fn(*a))
        dt = (time.perf_counter() - t0) / ns.reps
        print(f"{name:45s} {dt * 1e3:9.1f} ms")
        return dt

    # --- full pipeline ------------------------------------------------------
    sr_fn = make_scene_sr(model.apply, args, h0, w0, eval_batch=ns.eval_batch)
    full = timeit("full pipeline", sr_fn, params, scene)

    # --- pipeline with model pieces knocked out -----------------------------
    def partial_forward(n_blocks=4, head=True, skip=True, conv=True):
        def apply(params, lr, args):
            import lft_tpu.models.lft as m
            saved = m.LAYER_NUM
            m.LAYER_NUM = n_blocks
            try:
                out = m.forward(params, lr, args)
            finally:
                m.LAYER_NUM = saved
            return out
        return apply

    for n in (0, 1, 2, 4):
        fn = make_scene_sr(partial_forward(n), args, h0, w0,
                           eval_batch=ns.eval_batch)
        timeit(f"pipeline, {n} alt blocks", fn, params, scene)

    # --- isolated components at eval_batch ---------------------------------
    eb = ns.eval_batch
    patch = args.patch_size_for_test
    x = jnp.asarray(np.random.RandomState(1)
                    .rand(eb, 1, A * patch, A * patch).astype(np.float32))
    fwd = jax.jit(lambda p, x: model.apply(p, x, args))
    per_chunk = timeit(f"model forward, batch {eb}", fwd, params, x)
    from lft_tpu.ops.tiling import tiling_grid
    _g = tiling_grid(h0, w0, patch, args.stride_for_test)
    n_patches = _g["numU"] * _g["numV"]
    print(f"  -> {n_patches} patches => forward-only scene time "
          f"{per_chunk * n_patches / eb * 1e3:.1f} ms "
          f"(pipeline measured {full * 1e3:.1f} ms)")

    # skip path alone
    from lft_tpu.ops.bicubic import bicubic_upscale_views
    sk = jax.jit(lambda x: bicubic_upscale_views(x[:, 0], A, S)[:, None])
    timeit(f"bicubic skip, batch {eb}", sk, x)

    # tokenization + attention isolated, one alt-block's spa_trans
    C = args.channels
    compute_dtype = jnp.bfloat16 if ns.dtype == "bfloat16" else jnp.float32
    buf = jnp.asarray(np.random.RandomState(2)
                      .rand(eb, A * A, patch, patch, C), compute_dtype)
    p_cast = {k: v.astype(compute_dtype) for k, v in params.items()}
    from lft_tpu.ops.posenc import spatial_position, angular_position
    spa_pe = jnp.asarray(spatial_position(patch, patch, C))
    ang_pe = jnp.asarray(angular_position(A * A, C))

    spa = jax.jit(lambda p, b: lft_mod._spa_trans(
        b, p, "altblock.0.spa_trans.", spa_pe, "auto"))
    timeit(f"spa_trans, batch {eb}", spa, p_cast, buf)
    ang = jax.jit(lambda p, b: lft_mod._ang_trans(
        b, p, "altblock.0.ang_trans.", ang_pe))
    timeit(f"ang_trans, batch {eb}", ang, p_cast, buf)

    # upsampler path alone, in the model's current TPU formulation
    # (transposed-conv shuffle + 9-tap final conv, models/lft.py)
    mos = jnp.asarray(np.random.RandomState(4)
                      .rand(eb, A * patch, A * patch, C), compute_dtype)
    def upsample(p, m):
        w_up = p["upsampling.0.weight"][:, :, 0, 0]
        w_t = w_up.reshape(C, S, S, C).transpose(1, 2, 3, 0)[::-1, ::-1]
        m = jax.lax.conv_transpose(m, w_t, strides=(S, S), padding="VALID",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
        m = lft_mod._leaky(m)
        w3 = p["upsampling.3.weight"]
        w9 = w3[0].transpose(1, 2, 0).reshape(9, C)
        z = jnp.einsum("bhwc,tc->bhwt", m, w9)
        zp = jnp.pad(z, [(0, 0), (1, 1), (1, 1), (0, 0)])
        Hs, Ws = m.shape[1], m.shape[2]
        return sum(zp[:, dy:dy + Hs, dx:dx + Ws, dy * 3 + dx]
                   for dy in range(3) for dx in range(3))
    timeit(f"upsampler, batch {eb}", jax.jit(upsample), p_cast, mos)

    # tiling alone: divide + integrate round trip at scene scale
    from lft_tpu.ops.tiling import lf_divide, lf_integrate
    patch_t, stride_t = args.patch_size_for_test, args.stride_for_test
    def tile_roundtrip(scn):
        sub = lf_divide(scn, A, patch_t, stride_t)
        fake_sr = jnp.tile(sub, (1, 1, S, S))      # stand-in for model output
        return lf_integrate(fake_sr, A, patch_t * S, stride_t * S,
                            h0 * S, w0 * S)
    timeit("lf_divide+integrate only", jax.jit(tile_roundtrip), scene)

    # conv stack
    def conv_stack(p, x):
        x0 = lft_mod._conv3d_133(x, p["conv_init0.0.weight"])
        y = lft_mod._leaky(lft_mod._conv3d_133(x0, p["conv_init.0.weight"]))
        y = lft_mod._leaky(lft_mod._conv3d_133(y, p["conv_init.2.weight"]))
        y = lft_mod._leaky(lft_mod._conv3d_133(y, p["conv_init.4.weight"]))
        return y + x0
    views = jnp.asarray(np.random.RandomState(3)
                        .rand(eb * A * A, patch, patch, 1), compute_dtype)
    timeit(f"conv stack, batch {eb}", jax.jit(conv_stack), p_cast, views)


if __name__ == "__main__":
    main()
