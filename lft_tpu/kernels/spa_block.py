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

Inference-only: no custom VJP (training keeps the hybrid dispatch in
kernels/spa_attn.py -- its backward needs the (m, l) stats this kernel
deliberately never materializes). `LFT_SPAB_VPS=N` overrides
views-per-step for A/B benchmarking.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lft_tpu.kernels.spa_attn_hp import (
    _np_consts, _np_segsum_matrix, _replicate, _seg, pick_hp_geometry)

LN_EPS = 1e-5  # torch nn.LayerNorm default (models/lft.py LN_EPS)


def _ln(xf, w, b):
    """LayerNorm over the last axis of an f32 [rows, D] array."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + LN_EPS) * w + b


def _mm(a, b):
    return jax.lax.dot_general(a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(mask_ref, npad_ref, segt_ref, hm_ref, ln_ref, pe_ref, wu_ref,
            wqk_ref, wv_ref, wo_ref, w1_ref, w2_ref, wlin_ref, x_ref, o_ref,
            xpad_s, kpad_s, vpad_s, attn_s, *, h, w, th, tw, r, KB,
            num_heads):
    """One grid step = V views. x_ref [V, h, w, C]; o_ref [V, h, w, C];
    xpad_s [h+2, w+2, C] and kpad_s/vpad_s [h+2r, w+2r, D] are VMEM
    scratch reused across views and grid steps (borders zeroed once);
    attn_s [h, w, D] collects per-tile attention outputs so the post-chain
    matmuls run once per view at full [hw, *] MXU row fill (M=128-row
    per-tile matmuls measured ~8x below the M=1024 rate on v5e)."""
    C = x_ref.shape[-1]
    D = wu_ref.shape[-1]
    hl_h, hl_w = th + 2 * r, tw + 2 * r
    nq, nk = th * tw, hl_h * hl_w
    n_tw = w // tw
    scale = jnp.float32(float(D // num_heads) ** -0.5)
    io = x_ref.dtype
    pe = pe_ref[:, :, :].astype(jnp.float32).reshape(h * w, D)
    ln1w, ln1b = ln_ref[0, :], ln_ref[1, :]
    ln2w, ln2b = ln_ref[2, :], ln_ref[3, :]

    @pl.when(pl.program_id(0) == 0)
    def _zero_borders():
        xpad_s[:, :, :] = jnp.zeros((h + 2, w + 2, C), io)
        kpad_s[:, :, :] = jnp.zeros((hl_h + h - th, hl_w + w - tw, D), io)
        vpad_s[:, :, :] = jnp.zeros((hl_h + h - th, hl_w + w - tw, D), io)

    for vi in range(x_ref.shape[0]):
        # tokenization: unfold(3x3, zero-pad) + Linear as 9 accumulated
        # [hw, C] @ [C, D] MXU taps (reference model/LFT.py:164-169)
        xpad_s[1:1 + h, 1:1 + w, :] = x_ref[vi]
        tok_f = _mm(xpad_s[0:h, 0:w, :].reshape(h * w, C), wu_ref[0])
        for t9 in range(1, 9):
            ky, kx = t9 // 3, t9 % 3
            tok_f = tok_f + _mm(
                xpad_s[ky:ky + h, kx:kx + w, :].reshape(h * w, C),
                wu_ref[t9])
        tok = tok_f.astype(io)                           # [hw, D]
        xn = _ln(tok_f + pe, ln1w, ln1b).astype(io)
        qk = _mm(xn, wqk_ref[:, :])                      # [hw, 2D] MXU
        q_img = qk[:, :D].astype(io).reshape(h, w, D)
        k_img = qk[:, D:].astype(io).reshape(h, w, D)
        v_img = _mm(tok, wv_ref[:, :]).astype(io).reshape(h, w, D)
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
                    preferred_element_type=jnp.float32)  # [nq, H*KB] MXU
                s = s * scale + mask_ref[:, :]
                # deferred-normalization row softmax + pad-count-corrected
                # denominator (see kernels/spa_attn_hp.py)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                l = _seg(e, num_heads, KB, segt_ref)
                l = l - jnp.exp(-m) * npad_ref[t_idx]
                out_raw = jax.lax.dot_general(
                    e.astype(io), v_rep,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [nq, D] MXU
                attn = out_raw * jnp.dot(
                    1.0 / l, hm_ref[:, :].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
                attn_s[ti * th:(ti + 1) * th, tj * tw:(tj + 1) * tw, :] = (
                    attn.astype(io).reshape(th, tw, D))

        # fused post-chain once per view at full [hw, *] row fill
        attn_f = attn_s[:, :, :].reshape(h * w, D)
        x2 = _mm(attn_f, wo_ref[:, :]).astype(io) + tok
        xn2 = _ln(x2.astype(jnp.float32), ln2w, ln2b).astype(io)
        hid = jax.nn.relu(_mm(xn2, w1_ref[:, :])).astype(io)
        y = _mm(hid, w2_ref[:, :]).astype(io) + x2
        out_v = _mm(y, wlin_ref[:, :]).astype(o_ref.dtype)
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


def spa_trans_block_fused(x, pe_tok, params, prefix, num_heads: int,
                          k: int, pixel_major: bool = False):
    """Run the whole SpaTrans block on view images.

    x:      [B, h, w, C] view images (folded batch*A2), or with
            `pixel_major=True` a [Bb, h, w, A2, C] pixel-major buffer --
            each (batch, view) plane is DMA-gathered straight out of the
            strided layout (squeezed BlockSpec dim), so the fused
            pixel-major forward never materializes a view-major transpose;
    pe_tok: [h, w, D] the PE passed through unfold+MLP (computed outside,
            it is view-independent);
    params/prefix: the flat param dict and `altblock.{i}.spa_trans.`.
    Returns the same shape as `x`. Inference-only -- there is no VJP;
    callers must not differentiate through this.
    """
    if pixel_major:
        Bb, h, w, A2, C = x.shape
    else:
        B, h, w, C = x.shape
    r = k // 2
    mlp_w = params[prefix + "MLP.weight"]                   # [D, C*9]
    D = mlp_w.shape[0]
    th, tw, KB = pick_hp_geometry(h, w, num_heads, k)
    n_tiles = (h // th) * (w // tw)
    nq = th * tw
    io = x.dtype

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
                    params[prefix + "feed_forward.0.bias"]]
                   ).astype(jnp.float32)                    # [4, D]

    mask, npad, hm = (jnp.asarray(c) for c in
                      _np_consts(th, tw, r, h, w, num_heads, D, KB))
    segt = jnp.asarray(_np_segsum_matrix(num_heads, KB))
    hm = hm.astype(io)

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
                               num_heads=num_heads)
    scratch = [pltpu.VMEM((h + 2, w + 2, C), io),
               pltpu.VMEM((h + 2 * r, w + 2 * r, D), io),
               pltpu.VMEM((h + 2 * r, w + 2 * r, D), io),
               pltpu.VMEM((h, w, D), io)]
    wts = (mask, npad, segt, hm, ln, pe_tok.astype(io), wu.astype(io),
           wqk.astype(io), wv_t.astype(io), wo_t.astype(io),
           w1_t.astype(io), w2_t.astype(io), wlin_t.astype(io))
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
    out = pl.pallas_call(
        kernel, interpret=interpret, grid=(Bp // V,),
        in_specs=wspecs + [img(C)],
        out_specs=img(C),
        out_shape=jax.ShapeDtypeStruct((Bp, h, w, C), io),
        scratch_shapes=scratch,
    )(*wts, x_p)
    return out[:B]
