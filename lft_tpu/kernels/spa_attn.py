"""Tile-dense local-window spatial attention on the MXU (Pallas TPU kernel).

The offset-sweep kernel (lft_tpu/kernels/local_attn_vjp.py) computes the
5x5-window attention as 25 sequential shifted passes over the whole view
image -- each pass reloads the full k/v image from VMEM (25 x 2 x h*w*E
loads/view) and does elementwise VPU work. Measured, it is the single
largest cost of the whole pipeline. This kernel reformulates the same math
(reference model/LFT.py:147-187) as dense attention per QUERY TILE:

* each view image is cut into rectangular th x tw = 128-query tiles
  (MXU-aligned M) with (th+2r) x (tw+2r) zero-padded key/value halos,
  sliced from VMEM once per tile (~12x less VMEM read traffic than the
  offset sweep);
* the static window+bounds masks are precomputed in numpy and streamed in
  as a kernel input -- iota/div/mod chains inside the kernel are not
  constant-folded by Mosaic and measurably dominate the tile math;
* per head: scores = q [nq, dh] @ k^T [dh, nk] (MXU, input dtype -- bf16
  in production, f32 accumulation), masked f32 softmax (plain, not online:
  every key of a query is present in its halo), out = attn @ v (MXU).

The custom VJP uses the same tile structure with the standard dense-
attention backward identities (per-tile dk/dv accumulate into a padded
buffer; tiles run sequentially so read-modify-write is safe), so
`attention_impl='pallas'` remains trainable end to end.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_tile(h: int, w: int) -> tuple[int, int] | None:
    """Rectangular query tile (th, tw) dividing (h, w), preferring
    th*tw == 128 (MXU-aligned M), then smaller targets; None if only
    degenerate tilings exist (caller falls back to another impl)."""
    for target in (128, 64, 32, 16, 8):
        for th in (8, 16, 4, 32, 64, 128, 2, 1):
            if th > target:
                continue
            tw = target // th
            if th * tw == target and h % th == 0 and w % tw == 0:
                return th, tw
    return None


@functools.lru_cache(maxsize=None)
def _np_tile_mask(th: int, tw: int, r: int, h: int, w: int) -> np.ndarray:
    """All tiles' additive masks [n_tiles, th*tw, nk], static per
    geometry."""
    hl_h, hl_w = th + 2 * r, tw + 2 * r
    nq, nk = th * tw, hl_h * hl_w
    qi = np.arange(nq)[:, None]
    ki = np.arange(nk)[None, :]
    q_y, q_x = qi // tw, qi % tw
    k_y, k_x = ki // hl_w - r, ki % hl_w - r
    in_win = (np.abs(q_y - k_y) <= r) & (np.abs(q_x - k_x) <= r)
    tiles = []
    for ti in range(h // th):
        for tj in range(w // tw):
            in_img = ((ti * th + k_y >= 0) & (ti * th + k_y < h)
                      & (tj * tw + k_x >= 0) & (tj * tw + k_x < w))
            tiles.append(np.where(in_win & in_img, 0.0, -1e30))
    return np.asarray(tiles, dtype=np.float32)


def _fwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *, h, w, th, tw, r,
                num_heads, with_stats=False, m_ref=None, l_ref=None):
    """One grid step = one view image. q_ref [1, h, w, E]; k_ref/v_ref
    [1, h+2r, w+2r, E] zero-padded; mask_ref [n_tiles, nq, nk]. Matmuls run
    on the input dtype (bf16 in production: 4x the f32 MXU rate on v5e)
    with f32 accumulation; softmax math stays f32."""
    E = q_ref.shape[-1]
    dh = E // num_heads
    hl_h, hl_w = th + 2 * r, tw + 2 * r
    nq, nk = th * tw, hl_h * hl_w
    scale = jnp.float32(float(dh) ** -0.5)

    for ti in range(h // th):
        for tj in range(w // tw):
            q_t = q_ref[0, ti * th:(ti + 1) * th, tj * tw:(tj + 1) * tw, :]
            q_t = q_t.reshape(nq, E)
            k_t = k_ref[0, ti * th:ti * th + hl_h, tj * tw:tj * tw + hl_w, :]
            k_t = k_t.reshape(nk, E)
            v_t = v_ref[0, ti * th:ti * th + hl_h, tj * tw:tj * tw + hl_w, :]
            v_t = v_t.reshape(nk, E)
            t_idx = ti * (w // tw) + tj
            mask = mask_ref[t_idx]

            outs, ms, ls = [], [], []
            for hd in range(num_heads):
                sl = slice(hd * dh, (hd + 1) * dh)
                s = jax.lax.dot_general(
                    q_t[:, sl], k_t[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)       # [nq, nk] MXU
                s = s * scale + mask
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                denom = jnp.sum(e, axis=-1, keepdims=True)
                a = (e / denom).astype(v_t.dtype)
                outs.append(jnp.dot(a, v_t[:, sl],
                                    preferred_element_type=jnp.float32))
                if with_stats:
                    ms.append(m)
                    ls.append(denom)
            o_t = jnp.concatenate(outs, axis=-1)              # [nq, E]
            o_ref[0, ti * th:(ti + 1) * th, tj * tw:(tj + 1) * tw, :] = (
                o_t.reshape(th, tw, E).astype(o_ref.dtype))
            if with_stats:
                m_ref[0, t_idx] = jnp.concatenate(ms, axis=-1)  # [nq, H]
                l_ref[0, t_idx] = jnp.concatenate(ls, axis=-1)


def _bwd_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, m_ref, l_ref,
                dq_ref, dk_ref, dv_ref, *, h, w, th, tw, r, num_heads):
    """Standard dense-attention backward with the same tile structure:
      a  = exp(s - m) / l                       (recomputed, MXU score)
      D  = rowsum_k(a * (dO @ v^T))             (== rowsum(dO * O))
      dS = a * (dO @ v^T - D) * scale
      dQ = dS @ k ; dK = dS^T @ q ; dV = a^T @ dO    (all MXU)
    dk_ref/dv_ref are PADDED [1, h+2r, w+2r, E] accumulators; caller crops
    the margins."""
    E = q_ref.shape[-1]
    dh = E // num_heads
    hl_h, hl_w = th + 2 * r, tw + 2 * r
    nq, nk = th * tw, hl_h * hl_w
    scale = jnp.float32(float(dh) ** -0.5)

    dk_ref[0] = jnp.zeros_like(dk_ref[0])
    dv_ref[0] = jnp.zeros_like(dv_ref[0])

    for ti in range(h // th):
        for tj in range(w // tw):
            ysl = slice(ti * th, ti * th + hl_h)
            xsl = slice(tj * tw, tj * tw + hl_w)
            q_t = q_ref[0, ti * th:(ti + 1) * th, tj * tw:(tj + 1) * tw, :]
            q_t = q_t.reshape(nq, E)
            do_t = do_ref[0, ti * th:(ti + 1) * th, tj * tw:(tj + 1) * tw, :]
            do_t = do_t.reshape(nq, E)
            k_t = k_ref[0, ysl, xsl, :].reshape(nk, E)
            v_t = v_ref[0, ysl, xsl, :].reshape(nk, E)
            t_idx = ti * (w // tw) + tj
            m_t = m_ref[0, t_idx]                             # [nq, H]
            l_t = l_ref[0, t_idx]
            mask = mask_ref[t_idx]

            dq_parts, dk_parts, dv_parts = [], [], []
            for hd in range(num_heads):
                sl = slice(hd * dh, (hd + 1) * dh)
                s = jax.lax.dot_general(
                    q_t[:, sl], k_t[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale + mask
                a = jnp.exp(s - m_t[:, hd:hd + 1]) / l_t[:, hd:hd + 1]
                dov = jax.lax.dot_general(
                    do_t[:, sl], v_t[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)       # [nq, nk]
                D = jnp.sum(a * dov, axis=-1, keepdims=True)  # [nq, 1]
                ds = (a * (dov - D) * scale).astype(q_t.dtype)
                a_lp = a.astype(q_t.dtype)
                dq_parts.append(jnp.dot(ds, k_t[:, sl],
                                        preferred_element_type=jnp.float32))
                dk_parts.append(jax.lax.dot_general(
                    ds, q_t[:, sl],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))      # [nk, dh]
                dv_parts.append(jax.lax.dot_general(
                    a_lp, do_t[:, sl],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))      # [nk, dh]
            dq_t = jnp.concatenate(dq_parts, axis=-1)
            dq_ref[0, ti * th:(ti + 1) * th, tj * tw:(tj + 1) * tw, :] = (
                dq_t.reshape(th, tw, E).astype(dq_ref.dtype))
            dk_t = jnp.concatenate(dk_parts, axis=-1).reshape(hl_h, hl_w, E)
            dv_t = jnp.concatenate(dv_parts, axis=-1).reshape(hl_h, hl_w, E)
            dk_ref[0, ysl, xsl, :] = dk_ref[0, ysl, xsl, :] + dk_t
            dv_ref[0, ysl, xsl, :] = dv_ref[0, ysl, xsl, :] + dv_t


def _specs(h, w, E, r, n_tiles, nq, nk, num_heads):
    img = pl.BlockSpec((1, h, w, E), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    pad = pl.BlockSpec((1, h + 2 * r, w + 2 * r, E), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((n_tiles, nq, nk), lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((1, n_tiles, nq, num_heads), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return img, pad, mask, stat


def _fwd(q_img, k_img, v_img, num_heads, k, with_stats):
    B, h, w, E = q_img.shape
    r = k // 2
    tile = pick_tile(h, w)
    if tile is None:
        raise ValueError(
            f"no valid query tile for ({h}, {w}); use the offset or "
            f"XLA-tiled spatial attention impl for this geometry")
    th, tw = tile
    n_tiles = (h // th) * (w // tw)
    nq, nk = th * tw, (th + 2 * r) * (tw + 2 * r)
    kp = jnp.pad(k_img, [(0, 0), (r, r), (r, r), (0, 0)])
    vp = jnp.pad(v_img, [(0, 0), (r, r), (r, r), (0, 0)])
    mask = jnp.asarray(_np_tile_mask(th, tw, r, h, w))
    img, pad, mspec, stat = _specs(h, w, E, r, n_tiles, nq, nk, num_heads)
    interpret = jax.devices()[0].platform != "tpu"
    if with_stats:
        def kernel_stats(mm, q, kk, vv, o, m, l):
            _fwd_kernel(mm, q, kk, vv, o, h=h, w=w, th=th, tw=tw, r=r,
                        num_heads=num_heads, with_stats=True,
                        m_ref=m, l_ref=l)
        out, m, l = pl.pallas_call(
            kernel_stats, interpret=interpret, grid=(B,),
            in_specs=[mspec, img, pad, pad],
            out_specs=(img, stat, stat),
            out_shape=(jax.ShapeDtypeStruct((B, h, w, E), q_img.dtype),
                       jax.ShapeDtypeStruct((B, n_tiles, nq, num_heads),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((B, n_tiles, nq, num_heads),
                                            jnp.float32)),
        )(mask, q_img, kp, vp)
        return out, m, l
    kernel = functools.partial(_fwd_kernel, h=h, w=w, th=th, tw=tw, r=r,
                               num_heads=num_heads, with_stats=False)
    out = pl.pallas_call(
        kernel, interpret=interpret, grid=(B,),
        in_specs=[mspec, img, pad, pad],
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct((B, h, w, E), q_img.dtype),
    )(mask, q_img, kp, vp)
    return out, None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def windowed_attention_mxu(q_img, k_img, v_img, num_heads: int, k: int):
    """Differentiable tile-dense windowed attention on [B, h, w, E]
    projected q/k/v (scale applied inside; window k x k)."""
    out, _, _ = _fwd(q_img, k_img, v_img, num_heads, k, with_stats=False)
    return out


def _vjp_fwd(q_img, k_img, v_img, num_heads, k):
    out, m, l = _fwd(q_img, k_img, v_img, num_heads, k, with_stats=True)
    return out, (q_img, k_img, v_img, m, l)


def _vjp_bwd(num_heads, k, res, dout):
    q_img, k_img, v_img, m, l = res
    B, h, w, E = q_img.shape
    r = k // 2
    th, tw = pick_tile(h, w)
    n_tiles = (h // th) * (w // tw)
    nq, nk = th * tw, (th + 2 * r) * (tw + 2 * r)
    from lft_tpu.kernels.common import bwd_io_dtype
    io_dtype = bwd_io_dtype(q_img.dtype)
    kp = jnp.pad(k_img.astype(io_dtype), [(0, 0), (r, r), (r, r), (0, 0)])
    vp = jnp.pad(v_img.astype(io_dtype), [(0, 0), (r, r), (r, r), (0, 0)])
    mask = jnp.asarray(_np_tile_mask(th, tw, r, h, w))
    img, pad, mspec, stat = _specs(h, w, E, r, n_tiles, nq, nk, num_heads)
    interpret = jax.devices()[0].platform != "tpu"
    kernel = functools.partial(_bwd_kernel, h=h, w=w, th=th, tw=tw, r=r,
                               num_heads=num_heads)
    dq, dk_pad, dv_pad = pl.pallas_call(
        kernel, interpret=interpret, grid=(B,),
        in_specs=[mspec, img, pad, pad, img, stat, stat],
        out_specs=(img, pad, pad),
        out_shape=(jax.ShapeDtypeStruct((B, h, w, E), q_img.dtype),
                   jax.ShapeDtypeStruct((B, h + 2 * r, w + 2 * r, E),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((B, h + 2 * r, w + 2 * r, E),
                                        jnp.float32)),
    )(mask, q_img, kp, vp, dout.astype(io_dtype), m, l)
    dk = dk_pad[:, r:r + h, r:r + w, :].astype(k_img.dtype)
    dv = dv_pad[:, r:r + h, r:r + w, :].astype(v_img.dtype)
    return dq, dk, dv


windowed_attention_mxu.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def windowed_attention_hybrid(q_img, k_img, v_img, num_heads: int, k: int):
    """Windowed attention with per-context kernel choice (measured on v5e):

    * primal (inference, no grad trace): the head-packed MXU kernel
      (spa_attn_hp.py, 7.4 ms/op at the production chunk shape) when its
      halo fits; else the offset-sweep kernel (local_attn_vjp.py,
      10.7 ms/op);
    * VJP fwd + bwd (training): the head-packed fwd/bwd kernels
      (spa_attn_hp.py, full-depth MXU contractions) when applicable,
      else this module's tile-dense MXU kernels. Both avoid the offset
      backward's VMEM-OOM shapes.

    Caller must ensure BOTH gates hold: h*w small enough for the offset
    kernel's VMEM budget and `pick_tile(h, w)` valid."""
    from lft_tpu.kernels.spa_attn_hp import (
        headpacked_applicable, windowed_attention_headpacked)
    B, h, w, E = q_img.shape
    if headpacked_applicable(h, w, E, num_heads, k):
        return windowed_attention_headpacked(q_img, k_img, v_img,
                                             num_heads, k)
    from lft_tpu.kernels.local_attn_vjp import windowed_attention
    return windowed_attention(q_img, k_img, v_img, num_heads, k)


def _use_headpacked_pair(q_img, num_heads, k):
    """The head-packed fwd/bwd PAIR is used only when the backward I/O
    stays bf16: its f32 form overflows the 16 MB scoped-VMEM stack
    (spa_attn_hp._vjp_bwd notes V=2 already overflowed at the old, larger
    geometry). An f32-on-TPU run takes the tile-dense pair instead.  The
    choice is static (shape/dtype/platform) and must be made ONCE for
    both directions: the (m, l) residual stats are laid out per
    (tile, query, head), and the two kernel families pick their tile
    geometries independently (pick_hp_geometry vs pick_tile)."""
    from lft_tpu.kernels import spa_attn_hp as hp
    from lft_tpu.kernels.common import bwd_io_dtype
    B, h, w, E = q_img.shape
    if not hp.headpacked_applicable(h, w, E, num_heads, k):
        return False
    return (jax.devices()[0].platform != "tpu"
            or bwd_io_dtype(q_img.dtype) == jnp.bfloat16)


def _hybrid_vjp_fwd(q_img, k_img, v_img, num_heads, k):
    from lft_tpu.kernels import spa_attn_hp as hp
    if _use_headpacked_pair(q_img, num_heads, k):
        return hp._vjp_fwd(q_img, k_img, v_img, num_heads, k)
    return _vjp_fwd(q_img, k_img, v_img, num_heads, k)


def _hybrid_vjp_bwd(num_heads, k, res, dout):
    # re-derive the (static) choice made in _hybrid_vjp_fwd from the
    # residual q's shape and dtype -- fwd and bwd must agree, the stats
    # layouts differ between the kernel families
    from lft_tpu.kernels import spa_attn_hp as hp
    if _use_headpacked_pair(res[0], num_heads, k):
        return hp._vjp_bwd(num_heads, k, res, dout)
    return _vjp_bwd(num_heads, k, res, dout)


windowed_attention_hybrid.defvjp(_hybrid_vjp_fwd, _hybrid_vjp_bwd)


def local_attention_tile_mxu(qn, v, in_proj_weight, out_proj_weight,
                             num_heads: int, k: int = 5,
                             attention=windowed_attention_mxu):
    """Drop-in for ops.attention.local_attention (q = k = qn normed, v raw;
    torch-packed projections): projections as XLA GEMMs, tile-dense MXU
    kernel for the windowed attention itself."""
    wq, wk, wv = jnp.split(in_proj_weight, 3, axis=0)
    out = attention(qn @ wq.T, qn @ wk.T, v @ wv.T, num_heads, k)
    return out @ out_proj_weight.T
