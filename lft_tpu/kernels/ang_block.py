"""Fused angular-transformer block (Pallas TPU, inference primal only).

Companion to kernels/spa_block.py: one pallas_call runs the entire
AngTrans block (reference model/LFT.py:194-238) -- PE add, LayerNorm,
q/k/v projections, block-diagonal MXU attention over the A^2 view
tokens, out-projection, residual, FFN -- per pixel group:

    x [N, A2, C]  pixel-major tokens (N = B*h*w pixels; the only read)
      xn = LayerNorm(x + ang_pe)            (f32 accumulation in VMEM)
      q = k = xn @ Wqk;  v = x @ Wv         (asymmetric pre-norm:
                                             q = k = normed, v = RAW,
                                             model/LFT.py:230-233)
      per group of G = 128//A2 pixels: head-masked key replication +
        block-diagonal score matmul + deferred-normalization softmax
        (the ang_attn_mxu.py formulation, UNPACKED: C lanes)
      x2  = attn @ Wo + x                   (residual)
      out = FFN(LN(x2)) + x2                (model/LFT.py:207-214, 235)
    out [N, A2, C]  (the only write)

Pixel-major is the point: with tokens laid out [N, A2, C], a group's
G*A2 rows are CONTIGUOUS -- the [N, A2, C] -> [n_groups, G*A2, C]
regrouping is a free reshape, where the view-major path needed two full
[B, A2, h, w, C] HBM transposes plus three pair-packing copies per block
(the largest copies in the round-3 pipeline trace, docs/PERFORMANCE.md).
The pair-packed lane fill of ang_attn_mxu.py is deliberately dropped:
packing requires exactly those copies, and the unpacked formulation does
HALF the score/value MACs at half the MXU depth-efficiency -- a wash on
the MXU, a win on HBM.

Inference-only: no custom VJP (training keeps ang_attn_mxu.py's
custom-VJP dispatch). `LFT_ANGB_GPS=N` overrides groups-per-step.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lft_tpu.kernels.ang_attn_mxu import BLK, _consts, _seg_sums

LN_EPS = 1e-5  # torch nn.LayerNorm default


def _ln(xf, w, b):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + LN_EPS) * w + b


def _mm(a, b):
    return jax.lax.dot_general(a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _replicate(x, hm_ref, num_heads, rows):
    """[rows, C] -> [H*BLK, C] head-blocked, zero-padded rows. Unlike
    ang_attn_mxu's broadcast-multiply version, builds the blocks by
    concatenation: at C = 64 lanes Mosaic cannot shape-cast the
    [H, BLK, C] -> [H*BLK, C] collapse (half-filled lane tiles), which
    only ever ran in pair-packed 128-lane form before."""
    C = x.shape[1]
    xp = jnp.concatenate(
        [x, jnp.zeros((BLK - rows, C), x.dtype)], axis=0)     # [BLK, C]
    hm = hm_ref[:, :].astype(x.dtype)
    return jnp.concatenate(
        [xp * hm[h:h + 1, :] for h in range(num_heads)], axis=0)


def _kernel(mask_ref, hm_ref, pe_ref, ln_ref, wq_ref, wk_ref, wv_ref,
            wo_ref, w1_ref, w2_ref, x_ref, o_ref, *, num_heads):
    """One grid step = GPS groups. x_ref/o_ref [GPS, rows, C] where
    rows = G*A2; pe_ref [rows, C] f32 (ang_pe tiled across the group's
    pixels); mask_ref [rows, H*BLK] block-diagonal; ln_ref [4, C] f32."""
    C = x_ref.shape[-1]
    rows = x_ref.shape[1]
    scale = jnp.float32(float(C // num_heads) ** -0.5)
    io = x_ref.dtype
    ln1w, ln1b = ln_ref[0, :], ln_ref[1, :]
    ln2w, ln2b = ln_ref[2, :], ln_ref[3, :]

    for g in range(x_ref.shape[0]):
        x = x_ref[g]                                     # [rows, C]
        xf = x.astype(jnp.float32) + pe_ref[:, :]
        xn = _ln(xf, ln1w, ln1b).astype(io)
        q = _mm(xn, wq_ref[:, :]).astype(io)             # [rows, C]
        k = _mm(xn, wk_ref[:, :]).astype(io)
        v = _mm(x, wv_ref[:, :]).astype(io)
        k_rep = _replicate(k, hm_ref, num_heads, rows)   # [H*BLK, C]
        v_rep = _replicate(v, hm_ref, num_heads, rows)
        s = jax.lax.dot_general(
            q, k_rep, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [rows, H*BLK]
        s = s * scale + mask_ref[:, :]
        # deferred-normalization row softmax (see ang_attn_mxu.py)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = _seg_sums(e, num_heads, BLK)                 # [rows, H]
        out_raw = jax.lax.dot_general(
            e.astype(io), v_rep,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [rows, C]
        attn = out_raw * jnp.dot(1.0 / l,
                                 hm_ref[:, :].astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
        # fused post-chain
        x2 = _mm(attn.astype(io), wo_ref[:, :]).astype(io) + x
        xn2 = _ln(x2.astype(jnp.float32), ln2w, ln2b).astype(io)
        hid = jax.nn.relu(_mm(xn2, w1_ref[:, :])).astype(io)
        y = _mm(hid, w2_ref[:, :]).astype(io) + x2
        o_ref[g] = y.astype(o_ref.dtype)


def _gps():
    env = os.environ.get("LFT_ANGB_GPS", "")
    # GPS 4/8/16/32/64 measured 29.0/29.6/29.9/30.1/28.6 MPx/s end-to-end
    # at the production geometry (tools/bench_sweep.py --env, 2026-08-18):
    # bigger steps amortize grid overhead until the [GPS, G*A2, C] blocks
    # crowd VMEM double-buffering at 64
    return int(env) if env else 32


def ang_block_applicable(A2: int) -> bool:
    return A2 <= BLK


def ang_trans_block_fused(x, ang_pe, params, prefix, num_heads: int):
    """Run the whole AngTrans block on pixel-major tokens.

    x:      [N, A2, C] tokens (N = folded batch*h*w pixels);
    ang_pe: [A2, C] angular position encoding;
    params/prefix: flat param dict and `altblock.{i}.ang_trans.`.
    Returns [N, A2, C]. Inference-only -- no VJP."""
    N, A2, C = x.shape
    GPS = _gps()
    # Prefer a group size whose G*GPS divides N: the jnp.pad + [:N] slice
    # a ragged tail needs are FULL HBM copies of the token tensor (~13 ms
    # per 128^2 scene measured). MACs per pixel are G-independent
    # (rows * H*BLK * C / G = A2 * H*BLK * C), so a smaller divisible G
    # costs only a few percent more grid steps.
    G_max = max(BLK // A2, 1)
    G = G_max
    for g in range(G_max, 0, -1):
        if N % (g * GPS) == 0:
            G = g
            break
    rows = G * A2
    io = x.dtype

    ipw = params[prefix + "attention.in_proj_weight"]       # [3C, C]
    wq, wk, wv = jnp.split(ipw, 3, axis=0)
    wq_t, wk_t, wv_t = wq.T, wk.T, wv.T
    wo_t = params[prefix + "attention.out_proj.weight"].T
    w1_t = params[prefix + "feed_forward.1.weight"].T       # [C, 2C]
    w2_t = params[prefix + "feed_forward.4.weight"].T       # [2C, C]
    ln = jnp.stack([params[prefix + "norm.weight"],
                    params[prefix + "norm.bias"],
                    params[prefix + "feed_forward.0.weight"],
                    params[prefix + "feed_forward.0.bias"]]
                   ).astype(jnp.float32)                    # [4, C]
    mask, hm = (jnp.asarray(c) for c in _consts(A2, C, num_heads, G))
    hm = hm.astype(io)
    pe = jnp.tile(ang_pe.astype(jnp.float32), (G, 1))       # [rows, C]

    pad = (-N) % (G * GPS)
    x_p = jnp.pad(x, [(0, pad), (0, 0), (0, 0)]) if pad else x
    xg = x_p.reshape((N + pad) // G, rows, C)   # free reshape: pixel-major
    n_groups = xg.shape[0]

    grp = pl.BlockSpec((GPS, rows, C), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, num_heads=num_heads)
    interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        kernel, interpret=interpret, grid=(n_groups // GPS,),
        in_specs=[full(rows, num_heads * BLK), full(num_heads, C),
                  full(rows, C), full(4, C), full(C, C), full(C, C),
                  full(C, C), full(C, C), full(C, 2 * C), full(2 * C, C),
                  grp],
        out_specs=grp,
        out_shape=jax.ShapeDtypeStruct((n_groups, rows, C), io),
    )(mask, hm, pe, ln, wq_t.astype(io), wk_t.astype(io), wv_t.astype(io),
      wo_t.astype(io), w1_t.astype(io), w2_t.astype(io), xg)
    return out.reshape(-1, A2, C)[:N]
