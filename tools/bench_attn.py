"""Micro-benchmark: spatial/angular attention implementations on the device.

Times each interchangeable implementation of the two attention ops at the
production inference shape (one eval chunk = 16 patches -> 400 view images
of 32x32 tokens for spatial, 16384 pixel rows of 25 view tokens for
angular). Each op is CHAINED `--chain` times inside one jit region so the
~28 ms per-dispatch overhead of the tunneled device amortizes away.

Usage: python tools/bench_attn.py [--views 400] [--dtype bfloat16]
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
    ap.add_argument("--views", type=int, default=400, help="B*A2 view images")
    ap.add_argument("--rows", type=int, default=16384, help="angular pixel rows")
    ap.add_argument("--hw", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--only", default="", help="substring filter on variant names")
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lft_tpu.ops import attention as att

    dt = jnp.bfloat16 if ns.dtype == "bfloat16" else jnp.float32
    N, h, w = ns.views, ns.hw, ns.hw
    E, heads = 128, 8
    rng = np.random.RandomState(0)
    qn = jnp.asarray(rng.rand(N, h, w, E), dt)
    v = jnp.asarray(rng.rand(N, h, w, E), dt)
    ipw = jnp.asarray(rng.rand(3 * E, E) * 0.05, dt)
    opw = jnp.asarray(rng.rand(E, E) * 0.05, dt)

    def force(x):
        return float(jnp.sum(x))

    def timeit(name, op, a, b):
        if ns.only and ns.only not in name:
            return
        def chained(a, b):
            out = a
            for _ in range(ns.chain):
                out = op(out, b).astype(a.dtype)
            return out
        fn = jax.jit(chained)
        try:
            force(fn(a, b))
        except Exception as e:
            print(f"{name:44s} FAILED: {type(e).__name__}: {e}")
            return
        t0 = time.perf_counter()
        for _ in range(ns.reps):
            force(fn(a, b))
        dtm = (time.perf_counter() - t0) / ns.reps / ns.chain
        print(f"{name:44s} {dtm * 1e3:9.2f} ms/op")

    from lft_tpu.kernels.local_attn import local_attention_pallas
    timeit("spa offset-sweep pallas (current)",
           lambda a, b: local_attention_pallas(a, b, ipw, opw, heads, 5,
                                               variant="offset"), qn, v)
    timeit("spa tile-halo pallas",
           lambda a, b: local_attention_pallas(a, b, ipw, opw, heads, 5,
                                               variant="tile"), qn, v)
    timeit("spa XLA tiled-halo",
           lambda a, b: att.local_attention(a, b, ipw, opw, heads, k=5,
                                            impl="tiled"), qn, v)
    try:
        from lft_tpu.kernels.spa_attn import local_attention_tile_mxu
        timeit("spa tile-MXU pallas (new)",
               lambda a, b: local_attention_tile_mxu(a, b, ipw, opw, heads, 5),
               qn, v)
    except ImportError:
        pass
    try:
        from lft_tpu.kernels.spa_attn import local_attention_tile_mxu
        from lft_tpu.kernels.spa_attn_hp import windowed_attention_headpacked
        timeit("spa head-packed pallas (new2)",
               lambda a, b: local_attention_tile_mxu(
                   a, b, ipw, opw, heads, 5,
                   attention=windowed_attention_headpacked), qn, v)
    except ImportError:
        pass

    # angular: [rows, A2, C] tokens (one eval chunk = 16*32*32 = 16384 rows)
    A2, C = 25, 64
    rows = ns.rows
    tn = jnp.asarray(rng.rand(rows, A2, C), dt)
    tv = jnp.asarray(rng.rand(rows, A2, C), dt)
    aipw = jnp.asarray(rng.rand(3 * C, C) * 0.05, dt)
    aopw = jnp.asarray(rng.rand(C, C) * 0.05, dt)
    from lft_tpu.kernels.ang_attn import ang_attention_pallas
    timeit(f"ang key-sweep pallas (current) rows={rows}",
           lambda a, b: ang_attention_pallas(a, b, aipw, aopw, heads), tn, tv)
    timeit(f"ang XLA dense rows={rows}",
           lambda a, b: att.multi_head_attention(a, a, b, aipw, aopw, heads),
           tn, tv)
    try:
        from lft_tpu.kernels.ang_attn_mxu import ang_attention_mxu
        timeit(f"ang block-diag MXU pallas (new) rows={rows}",
               lambda a, b: ang_attention_mxu(a, b, aipw, aopw, heads), tn, tv)
    except ImportError:
        pass


if __name__ == "__main__":
    main()
