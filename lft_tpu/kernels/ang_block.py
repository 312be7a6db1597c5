"""Fused angular-transformer block (Pallas TPU, differentiable).

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

Training (round 4): the block carries a custom VJP. The forward saves
NOTHING beyond its inputs (no stats round-trip to HBM); the backward is
ONE Pallas kernel per group chunk that recomputes the whole block chain
in VMEM from the [rows, C] input and then backpropagates through it --
FFN, LN2, out-proj, block-diag attention (the ang_attn_mxu.py backward
identities), projections, LN1 -- accumulating all weight gradients in
f32 VMEM accumulators that flush to HBM once (constant-index-map output
blocks; the TPU grid is sequential, so read-modify-write is exact).
Padded tail rows contribute exactly zero to every accumulator because
their dout rows are zero and every gradient contraction has one operand
from the dout chain. `LFT_ANGB_GPS=N` / `LFT_ANGB_BWD_GPS=N` override
groups-per-step for the forward / backward.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lft_tpu.kernels.ang_attn_mxu import (BLK, _consts, _seg_bcast_matrix,
                                          _seg_sums)

LN_EPS = 1e-5  # torch nn.LayerNorm default


def _ln(xf, w, b):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + LN_EPS) * w + b


def _mm(a, b, prec=None):
    return jax.lax.dot_general(a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


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
            wo_ref, w1_ref, w2_ref, x_ref, o_ref, *, num_heads,
            mm_half=False, sites=frozenset(), m_ref=None, l_ref=None,
            attn_ref=None):
    """One grid step = GPS groups. x_ref/o_ref [GPS, rows, C] where
    rows = G*A2; pe_ref [rows, C] f32 (ang_pe tiled across the group's
    pixels); mask_ref [rows, H*BLK] block-diagonal; ln_ref [4, C] f32.

    `mm_half` (the `--dtype mixed` shipping mode): IO, residual stream,
    LayerNorms and softmax stats stay in the IO dtype (f32); each matmul
    SITE follows the (mdt, mpr) plan of kernels/common.mm_site_plan --
    f32 operands at precision=HIGHEST for the hp sites, bf16 single-pass
    for the rest (see spa_block._kernel). With mm_half=False the plan is
    the identity and every cast below is a no-op."""
    from lft_tpu.kernels.common import mm_site_plan
    C = x_ref.shape[-1]
    rows = x_ref.shape[1]
    scale = jnp.float32(float(C // num_heads) ** -0.5)
    io = x_ref.dtype
    mdt, mpr = mm_site_plan(mm_half, io, sites)
    ln1w, ln1b = ln_ref[0, :], ln_ref[1, :]
    ln2w, ln2b = ln_ref[2, :], ln_ref[3, :]

    for g in range(x_ref.shape[0]):
        x = x_ref[g]                                     # [rows, C]
        xf = x.astype(jnp.float32) + pe_ref[:, :]
        xn = _ln(xf, ln1w, ln1b).astype(mdt["aqkv"])
        q = _mm(xn, wq_ref[:, :], mpr["aqkv"]).astype(mdt["ascore"])
        k = _mm(xn, wk_ref[:, :], mpr["aqkv"]).astype(mdt["ascore"])
        v = _mm(x.astype(mdt["aqkv"]), wv_ref[:, :],
                mpr["aqkv"]).astype(mdt["aav"])
        k_rep = _replicate(k, hm_ref, num_heads, rows)   # [H*BLK, C]
        v_rep = _replicate(v, hm_ref, num_heads, rows)
        s = jax.lax.dot_general(
            q, k_rep, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mpr["ascore"])                     # [rows, H*BLK]
        s = s * scale + mask_ref[:, :]
        # deferred-normalization row softmax (see ang_attn_mxu.py;
        # _seg_sums is exact VPU slice reduction)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = _seg_sums(e, num_heads, BLK)                 # [rows, H]
        out_raw = jax.lax.dot_general(
            e.astype(mdt["aav"]), v_rep,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mpr["aav"])                        # [rows, C]
        attn = out_raw * jnp.dot(1.0 / l,
                                 hm_ref[:, :].astype(jnp.float32),
                                 preferred_element_type=jnp.float32,
                                 precision=mpr["aav"])
        attn_md = attn.astype(mdt["awo"])
        if m_ref is not None:
            m_ref[g] = m + jnp.zeros((rows, num_heads), jnp.float32)
            l_ref[g] = l
            attn_ref[g] = attn_md
        # fused post-chain
        x2 = _mm(attn_md, wo_ref[:, :], mpr["awo"]).astype(io) + x
        xn2 = _ln(x2.astype(jnp.float32), ln2w, ln2b).astype(mdt["affn"])
        hid = jax.nn.relu(_mm(xn2, w1_ref[:, :],
                              mpr["affn"])).astype(mdt["affn"])
        y = _mm(hid, w2_ref[:, :], mpr["affn"]).astype(io) + x2
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


def _pick_group(N: int, A2: int, gps: int) -> int:
    """Prefer a group size whose G*GPS divides N: the jnp.pad + [:N] slice
    a ragged tail needs are FULL HBM copies of the token tensor (~13 ms
    per 128^2 scene measured). MACs per pixel are G-independent
    (rows * H*BLK * C / G = A2 * H*BLK * C), so a smaller divisible G
    costs only a few percent more grid steps."""
    G_max = max(BLK // A2, 1)
    for g in range(G_max, 0, -1):
        if N % (g * gps) == 0:
            return g
    return G_max


def _group(x, G, GPS):
    """[N, A2, C] -> [n_groups, G*A2, C] (pixel-major regroup is a free
    reshape), zero-padding N to a multiple of G*GPS."""
    N, A2, C = x.shape
    pad = (-N) % (G * GPS)
    x_p = jnp.pad(x, [(0, pad), (0, 0), (0, 0)]) if pad else x
    return x_p.reshape((N + pad) // G, G * A2, C)


def _core_fwd(x, pe, ln, wq_t, wk_t, wv_t, wo_t, w1_t, w2_t, num_heads,
              with_res: bool = False, mm_half: bool = False):
    N, A2, C = x.shape
    GPS = _gps()
    G = _pick_group(N, A2, GPS)
    rows = G * A2
    io = x.dtype
    # per-site operand-dtype/precision plan (identity when mm_half=False)
    from lft_tpu.kernels.common import mm_hp_sites, mm_site_plan
    sites = mm_hp_sites() if mm_half else frozenset()
    mdt, _ = mm_site_plan(mm_half, io, sites)
    mask, hm = (jnp.asarray(c) for c in _consts(A2, C, num_heads, G))
    hm = hm.astype(mdt["ascore"])  # 0/1 mask: exact in any operand dtype
    pe_t = jnp.tile(pe.astype(jnp.float32), (G, 1))         # [rows, C]
    xg = _group(x, G, GPS)
    n_groups = xg.shape[0]

    grp = pl.BlockSpec((GPS, rows, C), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, num_heads=num_heads,
                               mm_half=mm_half, sites=sites)
    interpret = jax.devices()[0].platform != "tpu"
    wts = (mask, hm, pe_t, ln.astype(jnp.float32), wq_t.astype(mdt["aqkv"]),
           wk_t.astype(mdt["aqkv"]), wv_t.astype(mdt["aqkv"]),
           wo_t.astype(mdt["awo"]), w1_t.astype(mdt["affn"]),
           w2_t.astype(mdt["affn"]))
    in_specs = [full(rows, num_heads * BLK), full(num_heads, C),
                full(rows, C), full(4, C), full(C, C), full(C, C),
                full(C, C), full(C, C), full(C, 2 * C), full(2 * C, C),
                grp]
    if with_res:
        # training forward: stream out the softmax stats and attention
        # output so the fused backward skips the fwd-attention recompute.
        # Stats/attn are PER TOKEN, so they reshape grouping-free and the
        # backward may regroup with a different G.
        stat = pl.BlockSpec((GPS, rows, num_heads), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

        def kernel_res(*a):
            ins, (o, mr, lr, ar) = a[:11], a[11:]
            _kernel(*ins, o, num_heads=num_heads, mm_half=mm_half,
                    sites=sites, m_ref=mr, l_ref=lr, attn_ref=ar)

        out, m, l, attn = pl.pallas_call(
            kernel_res, interpret=interpret, grid=(n_groups // GPS,),
            in_specs=in_specs,
            out_specs=(grp, stat, stat, grp),
            out_shape=(jax.ShapeDtypeStruct((n_groups, rows, C), io),
                       jax.ShapeDtypeStruct((n_groups, rows, num_heads),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((n_groups, rows, num_heads),
                                            jnp.float32),
                       # attn is a pure matmul operand downstream (awo site)
                       jax.ShapeDtypeStruct((n_groups, rows, C),
                                            mdt["awo"])),
        )(*wts, xg)
        tok = lambda a, d: a.reshape(-1, A2, d)[:N]
        return (tok(out, C), tok(m, num_heads), tok(l, num_heads),
                tok(attn, C))
    out = pl.pallas_call(
        kernel, interpret=interpret, grid=(n_groups // GPS,),
        in_specs=in_specs,
        out_specs=grp,
        out_shape=jax.ShapeDtypeStruct((n_groups, rows, C), io),
    )(*wts, xg)
    return out.reshape(-1, A2, C)[:N]


def _bwd_kernel(mask_ref, hm_ref, seg_ref, pe_ref, ln_ref, wq_ref, wk_ref,
                wv_ref, wo_ref, w1_ref, w2_ref, x_ref, m_ref, l_ref,
                attn_ref, do_ref, dx_ref,
                dln_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref, dw1_ref,
                dw2_ref, *, num_heads, mm_half=False, sites=frozenset()):
    """Fused backward for the whole AngTrans block, consuming the saved
    softmax stats and attention output (no fwd-attention recompute; only
    the flash-intrinsic score matmul remains). One grid step = GPS
    groups; weight-grad outputs have constant index maps, so they live
    in VMEM across the (sequential) grid and flush once. `mm_half`
    mirrors the forward's mixed mode (f32 IO/residual cotangents, f32
    accumulators) with its OWN site plan (`sites`, LFT_MM_HP_BWD_SITES)."""
    from lft_tpu.kernels.common import mm_site_plan
    C = x_ref.shape[-1]
    rows = x_ref.shape[1]
    scale = jnp.float32(float(C // num_heads) ** -0.5)
    io = x_ref.dtype
    mdt, mpr = mm_site_plan(mm_half, io, sites)
    f32 = jnp.float32
    ln1w, ln1b = ln_ref[0, :], ln_ref[1, :]
    ln2w, ln2b = ln_ref[2, :], ln_ref[3, :]

    @pl.when(pl.program_id(0) == 0)
    def _zero_acc():
        dln_ref[:, :] = jnp.zeros_like(dln_ref)
        dwq_ref[:, :] = jnp.zeros_like(dwq_ref)
        dwk_ref[:, :] = jnp.zeros_like(dwk_ref)
        dwv_ref[:, :] = jnp.zeros_like(dwv_ref)
        dwo_ref[:, :] = jnp.zeros_like(dwo_ref)
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
        dw2_ref[:, :] = jnp.zeros_like(dw2_ref)

    # local f32 accumulators across the unrolled group loop: one
    # read-modify-write of the output blocks per grid step
    a_ln = jnp.zeros((4, C), f32)
    a_wq = jnp.zeros((C, C), f32)
    a_wk = jnp.zeros((C, C), f32)
    a_wv = jnp.zeros((C, C), f32)
    a_wo = jnp.zeros((C, C), f32)
    a_w1 = jnp.zeros((C, 2 * C), f32)
    a_w2 = jnp.zeros((2 * C, C), f32)

    def _dgen(a, b, dims, prec=None):
        return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=f32,
                                   precision=prec)

    for g in range(x_ref.shape[0]):
        x = x_ref[g]                                     # [rows, C] io
        x_md = x.astype(mdt["aqkv"])
        do = do_ref[g]
        do_md = do.astype(mdt["affn"])
        # ---- recompute the forward chain (same ops as _kernel) ----
        xf = x.astype(f32) + pe_ref[:, :]
        mu1 = jnp.mean(xf, axis=-1, keepdims=True)
        var1 = jnp.mean(jnp.square(xf - mu1), axis=-1, keepdims=True)
        rstd1 = jax.lax.rsqrt(var1 + LN_EPS)
        xhat1 = (xf - mu1) * rstd1
        xn = (xhat1 * ln1w + ln1b).astype(mdt["aqkv"])
        q = _mm(xn, wq_ref[:, :], mpr["aqkv"]).astype(mdt["ascore"])
        k = _mm(xn, wk_ref[:, :], mpr["aqkv"]).astype(mdt["ascore"])
        v = _mm(x_md, wv_ref[:, :], mpr["aqkv"]).astype(mdt["aav"])
        k_rep = _replicate(k, hm_ref, num_heads, rows)   # [H*BLK, C]
        v_rep = _replicate(v, hm_ref, num_heads, rows)
        s = (_dgen(q, k_rep, ((1,), (1,)), mpr["ascore"]) * scale
             + mask_ref[:, :])
        seg = seg_ref[:, :]                              # [H, H*BLK]
        m_b = jnp.dot(m_ref[g], seg, preferred_element_type=f32,
                      precision=mpr["ascore"])
        inv_b = jnp.dot(1.0 / l_ref[g], seg, preferred_element_type=f32,
                        precision=mpr["ascore"])
        a_f = jnp.exp(s - m_b) * inv_b                   # [rows, H*BLK]
        hm_f = hm_ref[:, :].astype(f32)
        attn_md = attn_ref[g].astype(mdt["awo"])         # saved
        x2 = _mm(attn_md, wo_ref[:, :], mpr["awo"]).astype(io) + x
        x2f = x2.astype(f32)
        mu2 = jnp.mean(x2f, axis=-1, keepdims=True)
        var2 = jnp.mean(jnp.square(x2f - mu2), axis=-1, keepdims=True)
        rstd2 = jax.lax.rsqrt(var2 + LN_EPS)
        xhat2 = (x2f - mu2) * rstd2
        xn2 = (xhat2 * ln2w + ln2b).astype(mdt["affn"])
        pre1 = _mm(xn2, w1_ref[:, :], mpr["affn"])       # [rows, 2C] f32
        hid = jax.nn.relu(pre1).astype(mdt["affn"])

        # ---- backward ----
        # y = hid @ w2 + x2
        dhid = _dgen(do_md, w2_ref[:, :], ((1,), (1,)), mpr["affn"])
        a_w2 = a_w2 + _dgen(hid, do_md, ((0,), (0,)), mpr["affn"])
        dpre1 = jnp.where(pre1 > 0, dhid, 0.0).astype(mdt["affn"])
        a_w1 = a_w1 + _dgen(xn2, dpre1, ((0,), (0,)), mpr["affn"])
        dxn2 = _dgen(dpre1, w1_ref[:, :], ((1,), (1,)), mpr["affn"])
        dln2w = jnp.sum(dxn2 * xhat2, axis=0, keepdims=True)
        dln2b = jnp.sum(dxn2, axis=0, keepdims=True)
        dxh2 = dxn2 * ln2w
        dx2 = do.astype(f32) + rstd2 * (
            dxh2 - jnp.mean(dxh2, axis=-1, keepdims=True)
            - xhat2 * jnp.mean(dxh2 * xhat2, axis=-1, keepdims=True))
        dx2_md = dx2.astype(mdt["awo"])
        # x2 = attn @ wo + x
        dattn = _dgen(dx2_md, wo_ref[:, :], ((1,), (1,)), mpr["awo"])
        a_wo = a_wo + _dgen(attn_md, dx2_md, ((0,), (0,)), mpr["awo"])
        dattn_md = dattn.astype(mdt["aav"])
        # block-diag attention backward (ang_attn_mxu identities)
        dov = _dgen(dattn_md, v_rep, ((1,), (1,)), mpr["aav"])
        D = _seg_sums(a_f * dov, num_heads, BLK)         # [rows, H]
        D_b = jnp.dot(D, seg, preferred_element_type=f32,
                      precision=mpr["ascore"])
        ds = (a_f * (dov - D_b) * scale).astype(mdt["ascore"])
        a_md = a_f.astype(mdt["aav"])
        dq = _dgen(ds, k_rep, ((1,), (0,)),
                   mpr["ascore"]).astype(mdt["aqkv"])    # [rows, C]
        dk_rep = _dgen(ds, q, ((0,), (0,)), mpr["ascore"])  # [H*BLK, C]
        dv_rep = _dgen(a_md, dattn_md, ((0,), (0,)), mpr["aav"])
        dk = jnp.zeros((rows, C), f32)
        dv = jnp.zeros((rows, C), f32)
        for h in range(num_heads):
            hmv = hm_f[h:h + 1, :]
            dk = dk + dk_rep[h * BLK:h * BLK + rows] * hmv
            dv = dv + dv_rep[h * BLK:h * BLK + rows] * hmv
        dk_md = dk.astype(mdt["aqkv"])
        dv_md = dv.astype(mdt["aqkv"])
        # q = xn @ wq; k = xn @ wk; v = x @ wv
        dxn = (_dgen(dq, wq_ref[:, :], ((1,), (1,)), mpr["aqkv"])
               + _dgen(dk_md, wk_ref[:, :], ((1,), (1,)), mpr["aqkv"]))
        a_wq = a_wq + _dgen(xn, dq, ((0,), (0,)), mpr["aqkv"])
        a_wk = a_wk + _dgen(xn, dk_md, ((0,), (0,)), mpr["aqkv"])
        a_wv = a_wv + _dgen(x_md, dv_md, ((0,), (0,)), mpr["aqkv"])
        dx = dx2 + _dgen(dv_md, wv_ref[:, :], ((1,), (1,)), mpr["aqkv"])
        # LN1 backward
        dln1w = jnp.sum(dxn * xhat1, axis=0, keepdims=True)
        dln1b = jnp.sum(dxn, axis=0, keepdims=True)
        a_ln = a_ln + jnp.concatenate([dln1w, dln1b, dln2w, dln2b], axis=0)
        dxh1 = dxn * ln1w
        dx = dx + rstd1 * (
            dxh1 - jnp.mean(dxh1, axis=-1, keepdims=True)
            - xhat1 * jnp.mean(dxh1 * xhat1, axis=-1, keepdims=True))
        dx_ref[g] = dx.astype(io)

    dln_ref[:, :] = dln_ref[:, :] + a_ln
    dwq_ref[:, :] = dwq_ref[:, :] + a_wq
    dwk_ref[:, :] = dwk_ref[:, :] + a_wk
    dwv_ref[:, :] = dwv_ref[:, :] + a_wv
    dwo_ref[:, :] = dwo_ref[:, :] + a_wo
    dw1_ref[:, :] = dw1_ref[:, :] + a_w1
    dw2_ref[:, :] = dw2_ref[:, :] + a_w2


def _bwd_gps():
    env = os.environ.get("LFT_ANGB_BWD_GPS", "")
    # the backward body is ~3x the forward body; smaller unroll keeps
    # Mosaic compile time and VMEM pressure in check
    return int(env) if env else 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def ang_block_core(x, pe, ln, wq_t, wk_t, wv_t, wo_t, w1_t, w2_t,
                   num_heads, mm_half=False):
    """Differentiable fused AngTrans block on [N, A2, C] pixel-major
    tokens. Weights are the pre-transposed tensors (see
    ang_trans_block_fused); ln is [4, C] = (norm.w, norm.b, ffn_ln.w,
    ffn_ln.b). pe receives a zero cotangent (the angular PE is derived
    from static shape, never learned -- reference model/LFT.py:70)."""
    return _core_fwd(x, pe, ln, wq_t, wk_t, wv_t, wo_t, w1_t, w2_t,
                     num_heads, mm_half=mm_half)


def _vjp_fwd(x, pe, ln, wq_t, wk_t, wv_t, wo_t, w1_t, w2_t, num_heads,
             mm_half):
    out, m, l, attn = _core_fwd(x, pe, ln, wq_t, wk_t, wv_t, wo_t, w1_t,
                                w2_t, num_heads, with_res=True,
                                mm_half=mm_half)
    return out, (x, pe, ln, wq_t, wk_t, wv_t, wo_t, w1_t, w2_t, m, l, attn)


def _vjp_bwd(num_heads, mm_half, res, dout):
    x, pe, ln, wq_t, wk_t, wv_t, wo_t, w1_t, w2_t, m, l, attn = res
    N, A2, C = x.shape
    from lft_tpu.kernels.common import (bwd_io_dtype, mm_hp_sites,
                                        mm_site_plan)
    io = bwd_io_dtype(x.dtype, mm_half)
    # backward site plan (LFT_MM_HP_BWD_SITES, default none -- see
    # spa_block._spa_vjp_bwd)
    sites = (mm_hp_sites("LFT_MM_HP_BWD_SITES", "none") if mm_half
             else frozenset())
    mdt, _ = mm_site_plan(mm_half, io, sites)
    GPS = _bwd_gps()
    G = _pick_group(N, A2, GPS)
    rows = G * A2
    mask, hm = (jnp.asarray(c) for c in _consts(A2, C, num_heads, G))
    seg = jnp.asarray(_seg_bcast_matrix(num_heads, BLK))
    hm = hm.astype(mdt["ascore"])
    pe_t = jnp.tile(pe.astype(jnp.float32), (G, 1))
    xg = _group(x.astype(io), G, GPS)
    dog = _group(dout.astype(io), G, GPS)
    # stats/attn were saved PER TOKEN, so regrouping with this G is free;
    # padded tail tokens need finite stats, their grads are dropped
    mg = _group(m, G, GPS)
    lg = _group(l, G, GPS)
    # _group zero-pads the tail; real softmax denominators are strictly
    # positive, so l == 0 exactly identifies pad rows -- give them a large
    # positive m (a_f = exp(s - m) underflows to exactly 0 instead of
    # exp(s) unclamped, whose inf could poison the shared weight-grad
    # accumulators via inf * 0 = NaN -- ADVICE r4 item 3) and a finite 1/l
    mg = jnp.where(lg == 0, 1e9, mg)
    lg = jnp.where(lg == 0, 1.0, lg)
    ag = _group(attn.astype(mdt["awo"]), G, GPS)
    n_groups = xg.shape[0]

    grp = pl.BlockSpec((GPS, rows, C), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((GPS, rows, num_heads), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads,
                               mm_half=mm_half, sites=sites)
    interpret = jax.devices()[0].platform != "tpu"
    f32 = jnp.float32
    acc = lambda shp: jax.ShapeDtypeStruct(shp, f32)
    dx, dln, dwq, dwk, dwv, dwo, dw1, dw2 = pl.pallas_call(
        kernel, interpret=interpret, grid=(n_groups // GPS,),
        in_specs=[full(rows, num_heads * BLK), full(num_heads, C),
                  full(num_heads, num_heads * BLK), full(rows, C),
                  full(4, C), full(C, C), full(C, C), full(C, C),
                  full(C, C), full(C, 2 * C), full(2 * C, C),
                  grp, stat, stat, grp, grp],
        out_specs=(grp, full(4, C), full(C, C), full(C, C), full(C, C),
                   full(C, C), full(C, 2 * C), full(2 * C, C)),
        out_shape=(jax.ShapeDtypeStruct((n_groups, rows, C), io),
                   acc((4, C)), acc((C, C)), acc((C, C)), acc((C, C)),
                   acc((C, C)), acc((C, 2 * C)), acc((2 * C, C))),
    )(mask, hm, seg, pe_t, ln.astype(f32), wq_t.astype(mdt["aqkv"]),
      wk_t.astype(mdt["aqkv"]), wv_t.astype(mdt["aqkv"]),
      wo_t.astype(mdt["awo"]), w1_t.astype(mdt["affn"]),
      w2_t.astype(mdt["affn"]), xg, mg, lg, ag, dog)
    dx = dx.reshape(-1, A2, C)[:N].astype(x.dtype)
    c = lambda g, w: g.astype(w.dtype)
    return (dx, jnp.zeros_like(pe), c(dln, ln), c(dwq, wq_t), c(dwk, wk_t),
            c(dwv, wv_t), c(dwo, wo_t), c(dw1, w1_t), c(dw2, w2_t))


ang_block_core.defvjp(_vjp_fwd, _vjp_bwd)


def ang_trans_block_fused(x, ang_pe, params, prefix, num_heads: int,
                          mm_half: bool = False):
    """Run the whole AngTrans block on pixel-major tokens.

    x:      [N, A2, C] tokens (N = folded batch*h*w pixels);
    ang_pe: [A2, C] angular position encoding;
    params/prefix: flat param dict and `altblock.{i}.ang_trans.`;
    mm_half: mixed-precision mode (`--dtype mixed`): f32 IO/residual
            stream with bf16 matmul operands (see `_kernel`).
    Returns [N, A2, C]. Differentiable: the block carries a custom VJP
    (one fused recompute+backward kernel; see module docstring)."""
    ipw = params[prefix + "attention.in_proj_weight"]       # [3C, C]
    wq, wk, wv = jnp.split(ipw, 3, axis=0)
    wo_t = params[prefix + "attention.out_proj.weight"].T
    w1_t = params[prefix + "feed_forward.1.weight"].T       # [C, 2C]
    w2_t = params[prefix + "feed_forward.4.weight"].T       # [2C, C]
    ln = jnp.stack([params[prefix + "norm.weight"],
                    params[prefix + "norm.bias"],
                    params[prefix + "feed_forward.0.weight"],
                    params[prefix + "feed_forward.0.bias"]])  # [4, C]
    return ang_block_core(x, ang_pe, ln, wq.T, wk.T, wv.T, wo_t, w1_t,
                          w2_t, num_heads, mm_half)
