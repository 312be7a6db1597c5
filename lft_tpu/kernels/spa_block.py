"""Fused spatial-transformer block (Pallas TPU, inference primal only).

Fifth-generation spatial kernel. The head-packed attention kernel
(kernels/spa_attn_hp.py) left the rest of the SpaTrans block -- the
unfold+MLP tokenization conv, PE add, LayerNorm, q/k/v projections, halo
zero-pads, out-projection, residual adds, the FFN, and the Token2SAI
linear (reference model/LFT.py:164-191) -- to XLA. A device trace of the
tiled-inference pipeline showed that XLA-side elementwise/layout soup
costing ~2x the attention kernels themselves (LayerNorm convert+reduce
fusions, halo pads, residual/FFN fusions, tokenization-conv layout
copies -- docs/PERFORMANCE.md).

This kernel runs the ENTIRE SpaTrans block per view image in one
pallas_call:

    x [V, h, w, C]  (the block input views -- the only HBM read)
      tok = unfold3x3(x) @ MLP                (9 shifted [hw, C] @ [C, D]
                                               MXU taps off a zero-padded
                                               VMEM scratch; torch unfold
                                               ordering, model/LFT.py:167)
      xn  = LayerNorm(tok + pe_tok)           (PE through the same MLP,
                                               model/LFT.py:180; f32)
      q, k = xn @ Wqk;  v = tok @ Wv          (asymmetric pre-norm:
                                               q = k = normed, v = RAW,
                                               model/LFT.py:183-187)
      k/v zero-halo'd into VMEM scratch       (replaces two HBM pad ops)
      per query tile: head-packed window-exact attention
                      (same geometry/masks/softmax as spa_attn_hp.py)
      per tile, still in VMEM:
        x2  = attn @ Wo + tok                 (residual)
        y   = FFN(LN(x2)) + x2                (Linear-ReLU-Linear,
                                               model/LFT.py:135-142)
        out = y @ Wlin                        (Token2SAI 1x1x1 conv,
                                               model/LFT.py:171-174)
    out [V, h, w, C]  (the only HBM write)

HBM traffic per view drops from ~15 tensor passes (several at the wider
token dim D = 2C) to one C-wide read + one C-wide write, and every
matmul is a full-depth MXU contraction. Scratch borders are zeroed once
at grid step 0 -- view interiors are fully rewritten per view, borders
never are.

Training (round 4): the view-major form carries a custom VJP. The
forward saves NOTHING beyond its inputs (no stats round-trip to HBM);
the backward is ONE Pallas kernel per view that (a) recomputes the whole
block chain in VMEM from the [h, w, C] view -- tokenization taps, LN1,
projections, halo'd window attention with per-tile (m, l) stats parked
in a small VMEM scratch -- and (b) backpropagates through it: Token2SAI,
FFN, LN2, out-proj, the head-packed attention backward (the
spa_attn_hp.py identities, dk/dv accumulated into padded f32 scratch and
cropped), projections, LN1, and the 9 transposed tokenization taps. All
weight gradients accumulate in f32 constant-index-map output blocks (the
TPU grid is sequential, so read-modify-write is exact), including the
PE-token gradient (the spatial PE rides through the SAME unfold+MLP as
the tokens, reference model/LFT.py:180, so its cotangent feeds the MLP
weight gradient outside the kernel). `LFT_SPAB_VPS=N` /
`LFT_SPAB_BWD_VPS=N` override views-per-step for forward / backward.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lft_tpu.kernels.common import mm_hp_sites, mm_site_plan
from lft_tpu.kernels.spa_attn_hp import (
    _np_consts, _np_segsum_matrix, _replicate, _seg, pick_hp_geometry)

LN_EPS = 1e-5  # torch nn.LayerNorm default (models/lft.py LN_EPS)


def _ln(xf, w, b):
    """LayerNorm over the last axis of an f32 [rows, D] array."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + LN_EPS) * w + b


def _mm(a, b, prec=None):
    return jax.lax.dot_general(a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _kernel(mask_ref, npad_ref, segt_ref, hm_ref, ln_ref, pe_ref, wu_ref,
            wqk_ref, wv_ref, wo_ref, w1_ref, w2_ref, wlin_ref, x_ref, o_ref,
            xpad_s, kpad_s, vpad_s, attn_s, *, h, w, th, tw, r, KB,
            num_heads, mm_half=False, sites=frozenset(), tok_ref=None,
            ml_ref=None, attn_ref=None):
    """One grid step = V views. x_ref [V, h, w, C]; o_ref [V, h, w, C];
    xpad_s [h+2, w+2, C] and kpad_s/vpad_s [h+2r, w+2r, D] are VMEM
    scratch reused across views and grid steps (borders zeroed once);
    attn_s [h, w, D] collects per-tile attention outputs so the post-chain
    matmuls run once per view at full [hw, *] MXU row fill (M=128-row
    per-tile matmuls measured ~8x below the M=1024 rate on v5e).

    `mm_half` (the `--dtype mixed` shipping mode): IO, residual stream,
    LayerNorms and softmax stats stay in the IO dtype (f32); each matmul
    SITE follows the (mdt, mpr) plan of kernels/common.mm_site_plan --
    f32 operands at precision=HIGHEST for the hp sites (Mosaic's DEFAULT
    f32 dot rounds operands to bf16, the r4 shipping-quality regression),
    bf16 single-pass for the rest. With mm_half=False the plan is the
    identity and the kernel is bit-identical to the r4 kernel."""
    from lft_tpu.kernels.common import mm_site_plan
    C = x_ref.shape[-1]
    D = wu_ref.shape[-1]
    hl_h, hl_w = th + 2 * r, tw + 2 * r
    nq, nk = th * tw, hl_h * hl_w
    n_tw = w // tw
    scale = jnp.float32(float(D // num_heads) ** -0.5)
    io = x_ref.dtype
    mdt, mpr = mm_site_plan(mm_half, io, sites)
    pe = pe_ref[:, :, :].astype(jnp.float32).reshape(h * w, D)
    ln1w, ln1b = ln_ref[0, :], ln_ref[1, :]
    ln2w, ln2b = ln_ref[2, :], ln_ref[3, :]

    @pl.when(pl.program_id(0) == 0)
    def _zero_borders():
        xpad_s[:, :, :] = jnp.zeros(xpad_s.shape, xpad_s.dtype)
        kpad_s[:, :, :] = jnp.zeros(kpad_s.shape, kpad_s.dtype)
        vpad_s[:, :, :] = jnp.zeros(vpad_s.shape, vpad_s.dtype)

    for vi in range(x_ref.shape[0]):
        # tokenization: unfold(3x3, zero-pad) + Linear as 9 accumulated
        # [hw, C] @ [C, D] MXU taps (reference model/LFT.py:164-169)
        xpad_s[1:1 + h, 1:1 + w, :] = x_ref[vi].astype(mdt["tok"])
        tok_f = _mm(xpad_s[0:h, 0:w, :].reshape(h * w, C), wu_ref[0],
                    mpr["tok"])
        for t9 in range(1, 9):
            ky, kx = t9 // 3, t9 % 3
            tok_f = tok_f + _mm(
                xpad_s[ky:ky + h, kx:kx + w, :].reshape(h * w, C),
                wu_ref[t9], mpr["tok"])
        tok = tok_f.astype(io)                           # [hw, D]
        if tok_ref is not None:
            tok_ref[vi] = tok.reshape(h, w, D)
        xn = _ln(tok_f + pe, ln1w, ln1b).astype(mdt["qk"])
        qk = _mm(xn, wqk_ref[:, :], mpr["qk"])           # [hw, 2D] MXU
        q_img = qk[:, :D].astype(mdt["score"]).reshape(h, w, D)
        k_img = qk[:, D:].astype(mdt["score"]).reshape(h, w, D)
        v_img = _mm(tok.astype(mdt["v"]), wv_ref[:, :],
                    mpr["v"]).astype(mdt["av"]).reshape(h, w, D)
        # zero-halo k/v in VMEM (replaces the XLA pad ops of the unfused
        # path; zero-pad keys score exactly 0 -> the shared mask + npad
        # denominator correction of spa_attn_hp stays exact)
        kpad_s[r:r + h, r:r + w, :] = k_img
        vpad_s[r:r + h, r:r + w, :] = v_img

        for ti in range(h // th):
            for tj in range(w // tw):
                t_idx = ti * n_tw + tj
                q_t = q_img[ti * th:(ti + 1) * th,
                            tj * tw:(tj + 1) * tw, :].reshape(nq, D)
                k_t = kpad_s[ti * th:ti * th + hl_h,
                             tj * tw:tj * tw + hl_w, :].reshape(nk, D)
                v_t = vpad_s[ti * th:ti * th + hl_h,
                             tj * tw:tj * tw + hl_w, :].reshape(nk, D)
                k_rep = _replicate(k_t, hm_ref, num_heads, KB)
                v_rep = _replicate(v_t, hm_ref, num_heads, KB)
                s = jax.lax.dot_general(
                    q_t, k_rep, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mpr["score"])              # [nq, H*KB] MXU
                s = s * scale + mask_ref[:, :]
                # deferred-normalization row softmax + pad-count-corrected
                # denominator (see kernels/spa_attn_hp.py)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                l = _seg(e, num_heads, KB, segt_ref, mpr["score"])
                l = l - jnp.exp(-m) * npad_ref[t_idx]
                if ml_ref is not None:
                    ml_ref[vi, 0, t_idx] = m + jnp.zeros(
                        (nq, num_heads), jnp.float32)
                    ml_ref[vi, 1, t_idx] = l
                out_raw = jax.lax.dot_general(
                    e.astype(mdt["av"]), v_rep,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mpr["av"])                 # [nq, D] MXU
                attn = out_raw * jnp.dot(
                    1.0 / l, hm_ref[:, :].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=mpr["av"])
                attn_s[ti * th:(ti + 1) * th, tj * tw:(tj + 1) * tw, :] = (
                    attn.astype(mdt["wo"]).reshape(th, tw, D))

        if attn_ref is not None:
            attn_ref[vi] = attn_s[:, :, :]
        # fused post-chain once per view at full [hw, *] row fill
        attn_f = attn_s[:, :, :].reshape(h * w, D)
        x2 = _mm(attn_f, wo_ref[:, :], mpr["wo"]).astype(io) + tok
        xn2 = _ln(x2.astype(jnp.float32), ln2w, ln2b).astype(mdt["ffn"])
        hid = jax.nn.relu(_mm(xn2, w1_ref[:, :], mpr["ffn"])).astype(
            mdt["ffn"])
        y = _mm(hid, w2_ref[:, :], mpr["ffn"]).astype(io) + x2
        out_v = _mm(y.astype(mdt["lin"]), wlin_ref[:, :],
                    mpr["lin"]).astype(o_ref.dtype)
        o_ref[vi] = out_v.reshape(h, w, o_ref.shape[-1])


def _views_per_step(n_tiles):
    env = os.environ.get("LFT_SPAB_VPS", "")
    if env:
        return int(env)
    # fewer views per grid step pipelines input/output DMA against
    # compute better than big blocks amortize grid overhead: at the
    # production 32x32/8-tile geometry VPS 1/2/4/8 measured
    # 29.6/29.6/27.6/28.4 MPx/s end-to-end (tools/bench_sweep.py --env,
    # 2026-08-18), so target ~8 tiles of work per step, not 32
    return max(1, 8 // n_tiles)


def spa_block_applicable(h: int, w: int, D: int, num_heads: int,
                         k: int) -> bool:
    if D % num_heads:
        return False
    return pick_hp_geometry(h, w, num_heads, k) is not None


def _prep(params, prefix):
    """Param dict -> the kernel-layout weight tensors (all traced jnp ops,
    so the custom VJP's weight cotangents flow back to the dict names)."""
    mlp_w = params[prefix + "MLP.weight"]                   # [D, C*9]
    D = mlp_w.shape[0]
    C = mlp_w.shape[1] // 9
    # torch unfold feature ordering c*9 + ky*3 + kx -> tap-major [9, C, D]
    wu = mlp_w.reshape(D, C, 9).transpose(2, 1, 0)          # [9, C, D]
    ipw = params[prefix + "attention.in_proj_weight"]       # [3D, D]
    wq, wk, wv = jnp.split(ipw, 3, axis=0)
    wqk = jnp.concatenate([wq.T, wk.T], axis=1)             # [D, 2D]
    wv_t = wv.T
    wo_t = params[prefix + "attention.out_proj.weight"].T   # [D, D]
    w1_t = params[prefix + "feed_forward.1.weight"].T       # [D, 2D]
    w2_t = params[prefix + "feed_forward.4.weight"].T       # [2D, D]
    wlin_t = params[prefix + "linear.0.weight"][:, :, 0, 0, 0].T  # [D, C]
    ln = jnp.stack([params[prefix + "norm.weight"],
                    params[prefix + "norm.bias"],
                    params[prefix + "feed_forward.0.weight"],
                    params[prefix + "feed_forward.0.bias"]])       # [4, D]
    return ln, wu, wqk, wv_t, wo_t, w1_t, w2_t, wlin_t


def _fwd_call(x, pe_tok, ln, wu, wqk, wv_t, wo_t, w1_t, w2_t, wlin_t,
              num_heads: int, k: int, pixel_major: bool = False,
              with_res: bool = False, mm_half: bool = False):
    if pixel_major:
        Bb, h, w, A2, C = x.shape
    else:
        B, h, w, C = x.shape
    r = k // 2
    D = wu.shape[-1]
    th, tw, KB = pick_hp_geometry(h, w, num_heads, k)
    n_tiles = (h // th) * (w // tw)
    nq = th * tw
    io = x.dtype
    # per-site operand-dtype/precision plan (identity when mm_half=False)
    sites = mm_hp_sites() if mm_half else frozenset()
    mdt, _ = mm_site_plan(mm_half, io, sites)

    mask, npad, hm = (jnp.asarray(c) for c in
                      _np_consts(th, tw, r, h, w, num_heads, D, KB))
    segt = jnp.asarray(_np_segsum_matrix(num_heads, KB))
    hm = hm.astype(mdt["score"])  # 0/1 mask: exact in any operand dtype
    ln = ln.astype(jnp.float32)

    V = _views_per_step(n_tiles)
    interpret = jax.devices()[0].platform != "tpu"
    full = lambda a, b: pl.BlockSpec((a, b), lambda *i: (0, 0),
                                     memory_space=pltpu.VMEM)
    pespec = pl.BlockSpec((h, w, D), lambda *i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    wuspec = pl.BlockSpec((9, C, D), lambda *i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    npspec = pl.BlockSpec((n_tiles, nq, num_heads), lambda *i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, h=h, w=w, th=th, tw=tw, r=r, KB=KB,
                               num_heads=num_heads, mm_half=mm_half,
                               sites=sites)
    scratch = [pltpu.VMEM((h + 2, w + 2, C), mdt["tok"]),
               pltpu.VMEM((h + 2 * r, w + 2 * r, D), mdt["score"]),
               pltpu.VMEM((h + 2 * r, w + 2 * r, D), mdt["av"]),
               pltpu.VMEM((h, w, D), mdt["wo"])]
    wts = (mask, npad, segt, hm, ln, pe_tok.astype(io), wu.astype(mdt["tok"]),
           wqk.astype(mdt["qk"]), wv_t.astype(mdt["v"]),
           wo_t.astype(mdt["wo"]), w1_t.astype(mdt["ffn"]),
           w2_t.astype(mdt["ffn"]), wlin_t.astype(mdt["lin"]))
    wspecs = [full(nq, num_heads * KB), npspec,
              full(num_heads * KB, num_heads),
              full(num_heads, D), full(4, D), pespec, wuspec,
              full(D, 2 * D), full(D, D), full(D, D),
              full(D, 2 * D), full(2 * D, D), full(D, C)]

    if pixel_major:
        # [Bb, h, w, A2, C]: 2-D grid (batch-chunks x views); each step
        # DMA-gathers V same-view planes via the squeezed A2 dim, so the
        # strided pixel-major layout never round-trips through a
        # view-major transpose in HBM
        pad_b = (-Bb) % V
        x_p = jnp.pad(x, [(0, pad_b)] + [(0, 0)] * 4) if pad_b else x
        Bbp = Bb + pad_b
        img_pm = lambda ch: pl.BlockSpec(
            (V, h, w, None, ch), lambda i, j: (i, 0, 0, j, 0),
            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel, interpret=interpret, grid=(Bbp // V, A2),
            in_specs=wspecs + [img_pm(C)],
            out_specs=img_pm(C),
            out_shape=jax.ShapeDtypeStruct((Bbp, h, w, A2, C), io),
            scratch_shapes=scratch,
        )(*wts, x_p)
        return out[:Bb]

    pad_b = (-B) % V
    x_p = jnp.pad(x, [(0, pad_b), (0, 0), (0, 0), (0, 0)]) if pad_b else x
    Bp = B + pad_b
    img = lambda ch: pl.BlockSpec((V, h, w, ch), lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    if with_res:
        # training forward: additionally stream out the residuals the
        # fused backward consumes -- tok (skips the 9 tokenization taps),
        # the per-tile softmax stats (skips max/segsum recompute), and the
        # attention output (skips the whole fwd-attention recompute).
        # ~1.3 MB/view of extra HBM writes vs ~0.6 GMAC/view of recompute.
        mlspec = pl.BlockSpec((V, 2, n_tiles, nq, num_heads),
                              lambda i: (i, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)

        def kernel_res(*a):
            ins, (o, tokr, mlr, attnr), scr = a[:14], a[14:18], a[18:]
            _kernel(*ins, o, *scr, h=h, w=w, th=th, tw=tw, r=r, KB=KB,
                    num_heads=num_heads, mm_half=mm_half, sites=sites,
                    tok_ref=tokr, ml_ref=mlr, attn_ref=attnr)

        out, tok, ml, attn = pl.pallas_call(
            kernel_res, interpret=interpret, grid=(Bp // V,),
            in_specs=wspecs + [img(C)],
            out_specs=(img(C), img(D), mlspec, img(D)),
            out_shape=(jax.ShapeDtypeStruct((Bp, h, w, C), io),
                       jax.ShapeDtypeStruct((Bp, h, w, D), io),
                       jax.ShapeDtypeStruct((Bp, 2, n_tiles, nq, num_heads),
                                            jnp.float32),
                       # attn is a pure matmul operand downstream (wo site)
                       jax.ShapeDtypeStruct((Bp, h, w, D), mdt["wo"])),
            scratch_shapes=scratch,
        )(*wts, x_p)
        return out[:B], tok[:B], ml[:B], attn[:B]
    out = pl.pallas_call(
        kernel, interpret=interpret, grid=(Bp // V,),
        in_specs=wspecs + [img(C)],
        out_specs=img(C),
        out_shape=jax.ShapeDtypeStruct((Bp, h, w, C), io),
        scratch_shapes=scratch,
    )(*wts, x_p)
    return out[:B]


def _bwd_kernel(mask_ref, segt_ref, seg_ref, hm_ref, ln_ref,
                pe_ref, wu_ref, wqk_ref, wv_ref, wo_ref, w1_ref, w2_ref,
                wlin_ref, x_ref, tok_ref, ml_ref, attn_ref, do_ref,
                dx_ref, dpe_ref, dln_ref, dwu_ref,
                dwqk_ref, dwv_ref, dwo_ref, dw1_ref, dw2_ref, dwlin_ref,
                xpad_s, kpad_s, vpad_s, dq_s, dkpad_s, dvpad_s,
                dxpad_s, *, h, w, th, tw, r, KB, num_heads, mm_half=False,
                sites=frozenset()):
    """Fused backward for the whole SpaTrans block, consuming the
    residuals the training forward streamed out (tok, per-tile softmax
    stats, attention output) so the only recompute left is the cheap
    part: LN1 (VPU), the q/k/v projections, the post-chain, and one
    score matmul per tile (the flash-attention-intrinsic one). One grid
    step = V views; weight-grad outputs have constant index maps, so
    they live in VMEM across the (sequential) grid and flush once;
    dkpad_s/dvpad_s are f32 halo accumulators cropped like the
    spa_attn_hp backward. `mm_half` mirrors the forward's mixed mode
    (f32 IO/residual cotangents, f32 accumulators) with its OWN site
    plan (`sites`, from LFT_MM_HP_BWD_SITES): each recompute/cotangent
    matmul follows the site of the forward op it belongs to."""
    from lft_tpu.kernels.common import mm_site_plan
    C = x_ref.shape[-1]
    D = wu_ref.shape[-1]
    hl_h, hl_w = th + 2 * r, tw + 2 * r
    nq, nk = th * tw, hl_h * hl_w
    n_tw = w // tw
    scale = jnp.float32(float(D // num_heads) ** -0.5)
    io = x_ref.dtype
    mdt, mpr = mm_site_plan(mm_half, io, sites)
    f32 = jnp.float32
    pe = pe_ref[:, :, :].astype(f32).reshape(h * w, D)
    ln1w, ln1b = ln_ref[0, :], ln_ref[1, :]
    ln2w, ln2b = ln_ref[2, :], ln_ref[3, :]
    hm_f = hm_ref[:, :].astype(f32)

    def _dgen(a, b, dims, prec=None):
        return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=f32,
                                   precision=prec)

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        xpad_s[:, :, :] = jnp.zeros(xpad_s.shape, xpad_s.dtype)
        kpad_s[:, :, :] = jnp.zeros_like(kpad_s)
        vpad_s[:, :, :] = jnp.zeros_like(vpad_s)
        dpe_ref[:, :, :] = jnp.zeros_like(dpe_ref)
        dln_ref[:, :] = jnp.zeros_like(dln_ref)
        dwu_ref[:, :, :] = jnp.zeros_like(dwu_ref)
        dwqk_ref[:, :] = jnp.zeros_like(dwqk_ref)
        dwv_ref[:, :] = jnp.zeros_like(dwv_ref)
        dwo_ref[:, :] = jnp.zeros_like(dwo_ref)
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
        dw2_ref[:, :] = jnp.zeros_like(dw2_ref)
        dwlin_ref[:, :] = jnp.zeros_like(dwlin_ref)

    a_pe = jnp.zeros((h * w, D), f32)
    a_ln = jnp.zeros((4, D), f32)
    a_wu = [jnp.zeros((C, D), f32) for _ in range(9)]
    a_wqk = jnp.zeros((D, 2 * D), f32)
    a_wv = jnp.zeros((D, D), f32)
    a_wo = jnp.zeros((D, D), f32)
    a_w1 = jnp.zeros((D, 2 * D), f32)
    a_w2 = jnp.zeros((2 * D, D), f32)
    a_wlin = jnp.zeros((D, C), f32)

    for vi in range(x_ref.shape[0]):
        # ---- light recompute: LN1 (VPU) + q/k/v projections + halos ----
        xpad_s[1:1 + h, 1:1 + w, :] = (
            x_ref[vi].astype(mdt["tok"]))                # for the dwu taps
        tok = tok_ref[vi].reshape(h * w, D)              # saved, io
        tok_md = tok.astype(mdt["v"])
        xf = tok.astype(f32) + pe
        mu1 = jnp.mean(xf, axis=-1, keepdims=True)
        var1 = jnp.mean(jnp.square(xf - mu1), axis=-1, keepdims=True)
        rstd1 = jax.lax.rsqrt(var1 + LN_EPS)
        xhat1 = (xf - mu1) * rstd1
        xn = (xhat1 * ln1w + ln1b).astype(mdt["qk"])
        qk = _mm(xn, wqk_ref[:, :], mpr["qk"])           # [hw, 2D]
        q_img = qk[:, :D].astype(mdt["score"]).reshape(h, w, D)
        kpad_s[r:r + h, r:r + w, :] = (
            qk[:, D:].astype(mdt["score"]).reshape(h, w, D))
        vpad_s[r:r + h, r:r + w, :] = (
            _mm(tok_md, wv_ref[:, :],
                mpr["v"]).astype(mdt["av"]).reshape(h, w, D))

        # ---- recompute post-chain from the saved attn, then backward ----
        attn_f = attn_ref[vi].reshape(h * w, D).astype(mdt["wo"])  # saved
        x2 = _mm(attn_f, wo_ref[:, :], mpr["wo"]).astype(io) + tok
        x2f = x2.astype(f32)
        mu2 = jnp.mean(x2f, axis=-1, keepdims=True)
        var2 = jnp.mean(jnp.square(x2f - mu2), axis=-1, keepdims=True)
        rstd2 = jax.lax.rsqrt(var2 + LN_EPS)
        xhat2 = (x2f - mu2) * rstd2
        xn2 = (xhat2 * ln2w + ln2b).astype(mdt["ffn"])
        pre = _mm(xn2, w1_ref[:, :], mpr["ffn"])         # [hw, 2D] f32
        hid = jax.nn.relu(pre).astype(mdt["ffn"])
        y = (_mm(hid, w2_ref[:, :], mpr["ffn"]).astype(io) + x2)

        dout = do_ref[vi].reshape(h * w, C).astype(mdt["lin"])
        dy = _dgen(dout, wlin_ref[:, :], ((1,), (1,)),
                   mpr["lin"])                           # [hw, D] f32
        a_wlin = a_wlin + _dgen(y.astype(mdt["lin"]), dout, ((0,), (0,)),
                                mpr["lin"])
        dy_md = dy.astype(mdt["ffn"])
        dhid = _dgen(dy_md, w2_ref[:, :], ((1,), (1,)),
                     mpr["ffn"])                         # [hw, 2D]
        a_w2 = a_w2 + _dgen(hid, dy_md, ((0,), (0,)), mpr["ffn"])
        dpre_md = jnp.where(pre > 0, dhid, 0.0).astype(mdt["ffn"])
        a_w1 = a_w1 + _dgen(xn2, dpre_md, ((0,), (0,)), mpr["ffn"])
        dxn2 = _dgen(dpre_md, w1_ref[:, :], ((1,), (1,)), mpr["ffn"])
        dln2w = jnp.sum(dxn2 * xhat2, axis=0, keepdims=True)
        dln2b = jnp.sum(dxn2, axis=0, keepdims=True)
        dxh2 = dxn2 * ln2w
        dx2 = dy + rstd2 * (
            dxh2 - jnp.mean(dxh2, axis=-1, keepdims=True)
            - xhat2 * jnp.mean(dxh2 * xhat2, axis=-1, keepdims=True))
        dx2_md = dx2.astype(mdt["wo"])
        dattn = _dgen(dx2_md, wo_ref[:, :], ((1,), (1,)), mpr["wo"])
        a_wo = a_wo + _dgen(attn_f, dx2_md, ((0,), (0,)), mpr["wo"])
        dattn_img = dattn.astype(mdt["av"]).reshape(h, w, D)
        dtok = dx2                                       # residual, f32

        # ---- attention backward per tile (spa_attn_hp identities) ----
        dkpad_s[:, :, :] = jnp.zeros_like(dkpad_s)
        dvpad_s[:, :, :] = jnp.zeros_like(dvpad_s)
        seg = seg_ref[:, :]                              # [H, H*KB]
        for ti in range(h // th):
            for tj in range(w // tw):
                t_idx = ti * n_tw + tj
                ysl = slice(ti * th, ti * th + hl_h)
                xsl = slice(tj * tw, tj * tw + hl_w)
                q_t = q_img[ti * th:(ti + 1) * th,
                            tj * tw:(tj + 1) * tw, :].reshape(nq, D)
                do_t = dattn_img[ti * th:(ti + 1) * th,
                                 tj * tw:(tj + 1) * tw, :].reshape(nq, D)
                k_rep = _replicate(
                    kpad_s[ysl, xsl, :].reshape(nk, D), hm_ref,
                    num_heads, KB)
                v_rep = _replicate(
                    vpad_s[ysl, xsl, :].reshape(nk, D), hm_ref,
                    num_heads, KB)
                s = (_dgen(q_t, k_rep, ((1,), (1,)), mpr["score"]) * scale
                     + mask_ref[:, :])
                m_b = jnp.dot(ml_ref[vi, 0, t_idx], seg,
                              preferred_element_type=f32,
                              precision=mpr["score"])
                inv_b = jnp.dot(1.0 / ml_ref[vi, 1, t_idx], seg,
                                preferred_element_type=f32,
                                precision=mpr["score"])
                a_f = jnp.exp(s - m_b) * inv_b           # [nq, H*KB]
                dov = _dgen(do_t, v_rep, ((1,), (1,)), mpr["av"])
                Dt = _seg(a_f * dov, num_heads, KB, segt_ref, mpr["score"])
                D_b = jnp.dot(Dt, seg, preferred_element_type=f32,
                              precision=mpr["score"])
                ds = (a_f * (dov - D_b) * scale).astype(mdt["score"])
                a_md = a_f.astype(mdt["av"])
                dq_s[ti * th:(ti + 1) * th, tj * tw:(tj + 1) * tw, :] = (
                    _dgen(ds, k_rep, ((1,), (0,)),
                          mpr["score"]).reshape(th, tw, D))
                dk_rep = _dgen(ds, q_t, ((0,), (0,)),
                               mpr["score"])             # [H*KB, D]
                dv_rep = _dgen(a_md, do_t, ((0,), (0,)), mpr["av"])
                dk_t = jnp.zeros((nk, D), f32)
                dv_t = jnp.zeros((nk, D), f32)
                for hd in range(num_heads):
                    hmv = hm_f[hd:hd + 1, :]
                    dk_t = dk_t + dk_rep[hd * KB:hd * KB + nk] * hmv
                    dv_t = dv_t + dv_rep[hd * KB:hd * KB + nk] * hmv
                dkpad_s[ysl, xsl, :] = (dkpad_s[ysl, xsl, :]
                                        + dk_t.reshape(hl_h, hl_w, D))
                dvpad_s[ysl, xsl, :] = (dvpad_s[ysl, xsl, :]
                                        + dv_t.reshape(hl_h, hl_w, D))

        # ---- projections, LN1, tokenization backward ----
        dq_md = dq_s[:, :, :].reshape(h * w, D).astype(mdt["qk"])
        dk_md = dkpad_s[r:r + h, r:r + w, :].reshape(
            h * w, D).astype(mdt["qk"])
        dv_md = dvpad_s[r:r + h, r:r + w, :].reshape(
            h * w, D).astype(mdt["v"])
        dxn = (_dgen(dq_md, wqk_ref[:, :D], ((1,), (1,)), mpr["qk"])
               + _dgen(dk_md, wqk_ref[:, D:], ((1,), (1,)), mpr["qk"]))
        a_wqk = a_wqk + _dgen(
            xn, jnp.concatenate([dq_md, dk_md], axis=1), ((0,), (0,)),
            mpr["qk"])
        dtok = dtok + _dgen(dv_md, wv_ref[:, :], ((1,), (1,)), mpr["v"])
        a_wv = a_wv + _dgen(tok_md, dv_md, ((0,), (0,)), mpr["v"])
        dln1w = jnp.sum(dxn * xhat1, axis=0, keepdims=True)
        dln1b = jnp.sum(dxn, axis=0, keepdims=True)
        a_ln = a_ln + jnp.concatenate([dln1w, dln1b, dln2w, dln2b], axis=0)
        dxh1 = dxn * ln1w
        dtokpe = rstd1 * (
            dxh1 - jnp.mean(dxh1, axis=-1, keepdims=True)
            - xhat1 * jnp.mean(dxh1 * xhat1, axis=-1, keepdims=True))
        dtok = dtok + dtokpe
        a_pe = a_pe + dtokpe
        dtok_md = dtok.astype(mdt["tok"])
        dxpad_s[:, :, :] = jnp.zeros_like(dxpad_s)
        for t9 in range(9):
            ky, kx = t9 // 3, t9 % 3
            a_wu[t9] = a_wu[t9] + _dgen(
                xpad_s[ky:ky + h, kx:kx + w, :].reshape(h * w, C),
                dtok_md, ((0,), (0,)), mpr["tok"])
            dxpad_s[ky:ky + h, kx:kx + w, :] = (
                dxpad_s[ky:ky + h, kx:kx + w, :]
                + _dgen(dtok_md, wu_ref[t9], ((1,), (1,)),
                        mpr["tok"]).reshape(h, w, C))
        dx_ref[vi] = dxpad_s[1:1 + h, 1:1 + w, :].astype(io)

    dpe_ref[:, :, :] = dpe_ref[:, :, :] + a_pe.reshape(h, w, D)
    dln_ref[:, :] = dln_ref[:, :] + a_ln
    dwu_ref[:, :, :] = dwu_ref[:, :, :] + jnp.stack(a_wu)
    dwqk_ref[:, :] = dwqk_ref[:, :] + a_wqk
    dwv_ref[:, :] = dwv_ref[:, :] + a_wv
    dwo_ref[:, :] = dwo_ref[:, :] + a_wo
    dw1_ref[:, :] = dw1_ref[:, :] + a_w1
    dw2_ref[:, :] = dw2_ref[:, :] + a_w2
    dwlin_ref[:, :] = dwlin_ref[:, :] + a_wlin


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def spa_block_core(x, pe_tok, ln, wu, wqk, wv_t, wo_t, w1_t, w2_t, wlin_t,
                   num_heads, k, mm_half=False):
    """Differentiable fused SpaTrans block on view-major [B, h, w, C]
    images. Weights are the kernel-layout tensors from `_prep`; ln is
    [4, D] = (norm.w, norm.b, ffn_ln.w, ffn_ln.b). pe_tok (the PE after
    unfold+MLP) receives a REAL cotangent -- it carries MLP.weight
    dependence (reference model/LFT.py:180)."""
    return _fwd_call(x, pe_tok, ln, wu, wqk, wv_t, wo_t, w1_t, w2_t,
                     wlin_t, num_heads, k, mm_half=mm_half)


def _spa_vjp_fwd(x, pe_tok, ln, wu, wqk, wv_t, wo_t, w1_t, w2_t, wlin_t,
                 num_heads, k, mm_half):
    out, tok, ml, attn = _fwd_call(x, pe_tok, ln, wu, wqk, wv_t, wo_t,
                                   w1_t, w2_t, wlin_t, num_heads, k,
                                   with_res=True, mm_half=mm_half)
    return out, (x, pe_tok, ln, wu, wqk, wv_t, wo_t, w1_t, w2_t, wlin_t,
                 tok, ml, attn)


def _spa_vjp_bwd(num_heads, k, mm_half, res, dout):
    (x, pe_tok, ln, wu, wqk, wv_t, wo_t, w1_t, w2_t, wlin_t,
     tok, ml, attn) = res
    B, h, w, C = x.shape
    D = wu.shape[-1]
    r = k // 2
    from lft_tpu.kernels.common import bwd_io_dtype, mm_site_plan
    io = bwd_io_dtype(x.dtype, mm_half)
    # the backward has its OWN site plan (LFT_MM_HP_BWD_SITES, default
    # none): gradients tolerate bf16 matmuls (recipe-validated,
    # runs/ref_recipe_s4_mixed), and the all-f32 backward's VMEM blocks
    # don't fit the production train geometry
    sites = (mm_hp_sites("LFT_MM_HP_BWD_SITES", "none") if mm_half
             else frozenset())
    mdt, _ = mm_site_plan(mm_half, io, sites)
    th, tw, KB = pick_hp_geometry(h, w, num_heads, k)
    n_tiles = (h // th) * (w // tw)
    nq = th * tw
    mask, _, hm = (jnp.asarray(c) for c in
                   _np_consts(th, tw, r, h, w, num_heads, D, KB))
    segt = jnp.asarray(_np_segsum_matrix(num_heads, KB))
    from lft_tpu.kernels.ang_attn_mxu import _seg_bcast_matrix
    seg = jnp.asarray(_seg_bcast_matrix(num_heads, KB))
    hm = hm.astype(mdt["score"])
    f32 = jnp.float32

    V = int(os.environ.get("LFT_SPAB_BWD_VPS", "1") or 1)
    pad_b = (-B) % V
    pad4 = lambda a: (jnp.pad(a, [(0, pad_b)] + [(0, 0)] * (a.ndim - 1))
                      if pad_b else a)
    x_p = pad4(x.astype(io))
    do_p = pad4(dout.astype(io))
    tok_p = pad4(tok.astype(io))
    attn_p = pad4(attn.astype(mdt["wo"]))
    ml_p = pad4(ml)
    if pad_b:
        # pad views need finite stats: l=1 gives a finite 1/l, and a large
        # positive m makes a_f = exp(s - m) underflow to exactly 0 (instead
        # of exp(s) unclamped, whose inf could poison the shared weight-
        # grad accumulators via inf * 0 = NaN -- ADVICE r4 item 3); the
        # pad views' own grads are dropped either way
        ml_p = ml_p.at[B:, 0].set(1e9).at[B:, 1].set(1.0)
    Bp = B + pad_b

    full = lambda *dims: pl.BlockSpec(dims, lambda i: (0,) * len(dims),
                                      memory_space=pltpu.VMEM)
    img = pl.BlockSpec((V, h, w, C), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    imgD = pl.BlockSpec((V, h, w, D), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    mlspec = pl.BlockSpec((V, 2, n_tiles, nq, num_heads),
                          lambda i: (i, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, h=h, w=w, th=th, tw=tw, r=r,
                               KB=KB, num_heads=num_heads, mm_half=mm_half,
                               sites=sites)
    scratch = [pltpu.VMEM((h + 2, w + 2, C), mdt["tok"]),        # xpad
               pltpu.VMEM((h + 2 * r, w + 2 * r, D), mdt["score"]),  # kpad
               pltpu.VMEM((h + 2 * r, w + 2 * r, D), mdt["av"]),     # vpad
               pltpu.VMEM((h, w, D), f32),                 # dq
               pltpu.VMEM((h + 2 * r, w + 2 * r, D), f32),  # dkpad
               pltpu.VMEM((h + 2 * r, w + 2 * r, D), f32),  # dvpad
               pltpu.VMEM((h + 2, w + 2, C), f32)]         # dxpad
    acc = lambda shp: jax.ShapeDtypeStruct(shp, f32)
    interpret = jax.devices()[0].platform != "tpu"
    outs = pl.pallas_call(
        kernel, interpret=interpret, grid=(Bp // V,),
        in_specs=[full(nq, num_heads * KB),
                  full(num_heads * KB, num_heads),
                  full(num_heads, num_heads * KB),
                  full(num_heads, D), full(4, D), full(h, w, D),
                  full(9, C, D), full(D, 2 * D), full(D, D), full(D, D),
                  full(D, 2 * D), full(2 * D, D), full(D, C),
                  img, imgD, mlspec, imgD, img],
        out_specs=(img, full(h, w, D), full(4, D), full(9, C, D),
                   full(D, 2 * D), full(D, D), full(D, D), full(D, 2 * D),
                   full(2 * D, D), full(D, C)),
        out_shape=(jax.ShapeDtypeStruct((Bp, h, w, C), io),
                   acc((h, w, D)), acc((4, D)), acc((9, C, D)),
                   acc((D, 2 * D)), acc((D, D)), acc((D, D)),
                   acc((D, 2 * D)), acc((2 * D, D)), acc((D, C))),
        scratch_shapes=scratch,
    )(mask, segt, seg, hm, ln.astype(f32),
      pe_tok.astype(io), wu.astype(mdt["tok"]), wqk.astype(mdt["qk"]),
      wv_t.astype(mdt["v"]), wo_t.astype(mdt["wo"]), w1_t.astype(mdt["ffn"]),
      w2_t.astype(mdt["ffn"]), wlin_t.astype(mdt["lin"]),
      x_p, tok_p, ml_p, attn_p, do_p)
    dx, dpe, dln, dwu, dwqk, dwv, dwo, dw1, dw2, dwlin = outs
    c = lambda g, t: g.astype(t.dtype)
    return (dx[:B].astype(x.dtype), c(dpe, pe_tok), c(dln, ln), c(dwu, wu),
            c(dwqk, wqk), c(dwv, wv_t), c(dwo, wo_t), c(dw1, w1_t),
            c(dw2, w2_t), c(dwlin, wlin_t))


spa_block_core.defvjp(_spa_vjp_fwd, _spa_vjp_bwd)


def spa_trans_block_fused(x, pe_tok, params, prefix, num_heads: int,
                          k: int, pixel_major: bool = False,
                          mm_half: bool = False):
    """Run the whole SpaTrans block on view images.

    x:      [B, h, w, C] view images (folded batch*A2), or with
            `pixel_major=True` a [Bb, h, w, A2, C] pixel-major buffer --
            each (batch, view) plane is DMA-gathered straight out of the
            strided layout (squeezed BlockSpec dim), so the fused
            pixel-major forward never materializes a view-major transpose;
    pe_tok: [h, w, D] the PE passed through unfold+MLP (computed outside,
            it is view-independent; its cotangent carries the MLP.weight
            dependence back to the caller);
    params/prefix: the flat param dict and `altblock.{i}.spa_trans.`;
    mm_half: mixed-precision mode (`--dtype mixed`): f32 IO/residual
            stream with bf16 matmul operands (see `_kernel`).
    Returns the same shape as `x`. The view-major form is differentiable
    (custom VJP, one fused recompute+backward kernel); the pixel-major
    form stays inference-only.
    """
    wts = _prep(params, prefix)
    if pixel_major:
        return _fwd_call(x, pe_tok, *wts, num_heads, k, pixel_major=True,
                         mm_half=mm_half)
    return spa_block_core(x, pe_tok, *wts, num_heads, k, mm_half)
