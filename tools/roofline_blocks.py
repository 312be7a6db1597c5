"""Join the empirical MXU roofline to the fused-block kernels (VERDICT r3 #4).

For each fused whole-block kernel (kernels/spa_block.py,
kernels/ang_block.py, forward and training backward) this tool:

  1. inventories the MXU MACs the kernel actually issues at the
     production geometry (static formulas from the kernel structure --
     head-packed score/value matmuls at [nq, H*KB] width, tokenization
     taps, projections, FFN);
  2. measures the chip's attainable MAC rate AT THOSE SHAPES with
     tools/bench_roofline.py's chained-matmul microbench (the practical
     ceiling -- NOT the datasheet number: the score matmuls have only
     nq = 128 output rows, which caps MXU row fill);
  3. times the kernel end-to-end (chained inside one jit, V views) and
     reports measured vs attainable.

"attainable" = sum_i MACs_i / rate(shape_i): the time the kernel's own
matmul inventory would take if every matmul hit the microbenched rate for
its shape with zero VPU/layout/DMA overhead. A kernel near 100% is
MXU-issue-bound; the gap is VPU passes + pipeline bubbles.

    python tools/roofline_blocks.py            # production 32x32 geometry
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
import numpy as np

from tools.bench_roofline import kernel_matmul


def _fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def _timed_fn(fn, *args, reps=10):
    _fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / reps


def spa_macs(h, w, C, D, H, th, tw, KB):
    """Per-view MXU MACs of the fused SpaTrans forward, grouped by the
    matmul shape that executes them (kernels/spa_block.py:_kernel)."""
    hw = h * w
    n_tiles = (h // th) * (w // tw)
    nq = th * tw
    return {
        # (m, k, n): macs
        (hw, C, D): 9 * hw * C * D,                  # tokenization taps
        (hw, D, 2 * D): hw * D * 2 * D               # qk projection
        + hw * D * 2 * D + hw * 2 * D * D,           # FFN up+down
        (hw, D, D): hw * D * D * 2,                  # v proj + out proj
        (nq, D, H * KB): n_tiles * nq * D * H * KB,  # scores s
        (nq, H * KB, D): n_tiles * nq * H * KB * D,  # e @ v_rep
        (hw, D, C): hw * D * C,                      # Token2SAI
    }


def spa_bwd_macs(h, w, C, D, H, th, tw, KB):
    """Per-view MACs of the residual-consuming fused backward
    (kernels/spa_block.py:_bwd_kernel)."""
    hw = h * w
    n_tiles = (h // th) * (w // tw)
    nq = th * tw
    score = n_tiles * nq * D * H * KB
    return {
        (hw, D, 2 * D): hw * D * 2 * D               # qk recompute
        + 2 * hw * D * 2 * D,                        # dxn (dq,dk legs) + dWqk
        (hw, D, D): hw * D * D                       # v recompute
        + 5 * hw * D * D,  # x2, dattn, dWo, dtok<-dv, dWv (post + proj bwd)
        (hw, D, C): 2 * hw * D * C                   # wlin fwd+bwd (dy, dWlin)
        + 18 * hw * C * D,                           # 9 dwu taps + 9 dx taps
        (hw, 2 * D, D): 3 * hw * 2 * D * D           # FFN recompute (up+down)
        + 2 * hw * 2 * D * D,                        # dhid, dW2/dW1/dxn2 legs
        (nq, D, H * KB): score                       # s recompute
        + score,                                     # dov
        (nq, H * KB, D): score,                      # dq
        (H * KB, nq, D): 2 * score,                  # dk_rep, dv_rep
    }


def ang_macs(A2, C, H, G, BLK=128):
    """Per-GROUP (G pixels) MACs of the fused AngTrans forward."""
    rows = G * A2
    return {
        (rows, C, C): 3 * rows * C * C               # q, k, v proj
        + 2 * rows * C * C,                          # out proj + (resid)
        (rows, C, 2 * C): 2 * rows * C * 2 * C,      # FFN
        (rows, C, H * BLK): rows * C * H * BLK,      # scores
        (rows, H * BLK, C): rows * H * BLK * C,      # e @ v_rep
    }


def attainable_ms(macs_by_shape, rates, views):
    t = 0.0
    for (m, k, n), macs in macs_by_shape.items():
        key = (m, k, n)
        if key not in rates:
            rates[key] = kernel_matmul(m, k, n)[0]
        t += macs / (rates[key] * 1e12)
    return t * views * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=200,
                    help="views per measurement (train batch 8 x A2=25)")
    ap.add_argument("--json", default=None)
    ns = ap.parse_args()

    import lft_tpu.models.lft as lft_mod
    from lft_tpu.config import Args
    from lft_tpu.kernels.spa_attn_hp import pick_hp_geometry
    from lft_tpu.kernels.ang_block import _pick_group, ang_trans_block_fused
    from lft_tpu.ops.posenc import spatial_position, angular_position

    h = w = 32
    C, H, A2 = 64, 8, 25
    D = 2 * C
    th, tw, KB = pick_hp_geometry(h, w, H, 5)
    V = ns.views
    N = V * h * w // A2 * A2  # ang tokens ~ V*hw pixels grouped by A2...
    # ang runs on B*h*w pixels where B = V/A2 samples: N_pix = (V//A2)*h*w
    n_pix = (V // A2) * h * w
    io = jnp.bfloat16

    args = Args(angRes=5, scale_factor=2, channels=C)
    params = lft_mod.init_params(jax.random.PRNGKey(0), args)
    params = {k: v.astype(io) for k, v in params.items()}
    spa_pe = jnp.asarray(spatial_position(h, w, C))
    ang_pe = jnp.asarray(angular_position(A2, C))
    x_spa = jax.random.normal(jax.random.PRNGKey(0), (1, V, h, w, C), io)
    x_ang = jax.random.normal(jax.random.PRNGKey(1), (n_pix, A2, C), io)
    pref_s = "altblock.1.spa_trans."
    pref_a = "altblock.1.ang_trans."
    sub_s = {k: params[k] for k in params if k.startswith(pref_s)}
    sub_a = {k: params[k] for k in params if k.startswith(pref_a)}

    print(f"device: {jax.devices()[0]}  geometry: tile {th}x{tw} KB={KB} "
          f"V={V} n_pix={n_pix}", flush=True)
    rates = {}

    # ---- measured kernel times (chained in one jit via grad/apply) ----
    def spa_fwd(sub, x):
        p = dict(params); p.update(sub)
        return jnp.sum(lft_mod._spa_trans(x, p, pref_s, spa_pe, "tiled",
                                          fused=True).astype(jnp.float32))

    def ang_fwd(sub, x):
        p = dict(params); p.update(sub)
        return jnp.sum(ang_trans_block_fused(x, ang_pe, p, pref_a,
                                             H).astype(jnp.float32))

    t_spa_f = _timed_fn(jax.jit(spa_fwd), sub_s, x_spa) * 1e3
    t_spa_g = _timed_fn(jax.jit(jax.grad(spa_fwd, argnums=(0, 1))),
                        sub_s, x_spa) * 1e3
    t_ang_f = _timed_fn(jax.jit(ang_fwd), sub_a, x_ang) * 1e3
    t_ang_g = _timed_fn(jax.jit(jax.grad(ang_fwd, argnums=(0, 1))),
                        sub_a, x_ang) * 1e3
    disp = 0.0  # tunnel dispatch floor is shared; report raw and net-of-fwd

    # ---- attainable ----
    att_spa_f = attainable_ms(spa_macs(h, w, C, D, H, th, tw, KB), rates, V)
    att_spa_b = attainable_ms(spa_bwd_macs(h, w, C, D, H, th, tw, KB),
                              rates, V)
    G = _pick_group(n_pix, A2, 32)
    att_ang_f = attainable_ms(ang_macs(A2, C, H, G), rates, n_pix // G)
    # ang backward ~ fwd recompute-lite + 4 score-width matmuls + derep
    ang_b = ang_macs(A2, C, H, G)
    rows = G * A2
    ang_b[(rows, C, 1024)] = ang_b.pop((rows, C, H * 128),
                                       rows * C * H * 128)  # s recompute
    ang_b[(rows, 1024, C)] = 3 * rows * H * 128 * C         # dov, dq, (+)
    ang_b[(1024, rows, C)] = 2 * rows * H * 128 * C         # dk_rep, dv_rep
    att_ang_b = attainable_ms(ang_b, rates, n_pix // G)

    rows_out = []
    for name, meas, att in [
            ("spa block fwd", t_spa_f, att_spa_f),
            ("spa block fwd+bwd", t_spa_g, att_spa_f + att_spa_b),
            ("ang block fwd", t_ang_f, att_ang_f),
            ("ang block fwd+bwd", t_ang_g, att_ang_f + att_ang_b)]:
        pct = 100.0 * att / meas if meas else 0.0
        rows_out.append({"kernel": name, "measured_ms": round(meas, 2),
                         "attainable_ms": round(att, 2),
                         "pct_of_attainable": round(pct, 1)})
        print(f"{name:20s} measured {meas:7.2f} ms   attainable "
              f"{att:7.2f} ms   -> {pct:5.1f}%", flush=True)

    print("\nmicrobenched rates (TMAC/s) at the kernels' shapes:")
    for (m, k, n), r in sorted(rates.items()):
        print(f"  [{m:5d},{k:5d}]x[{k:5d},{n:5d}]: {r:7.2f}")
    if ns.json:
        with open(ns.json, "w") as f:
            json.dump({"rows": rows_out,
                       "rates_tmacs": {str(k): v for k, v in rates.items()},
                       "device": str(jax.devices()[0])}, f, indent=1)
        print(f"wrote {ns.json}")


if __name__ == "__main__":
    main()
