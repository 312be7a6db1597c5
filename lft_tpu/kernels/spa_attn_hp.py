"""Head-packed tile-dense local-window spatial attention (Pallas, TPU).

Third-generation spatial attention kernel (reference semantics:
model/LFT.py:147-187 -- 5x5-window masked MHSA over h*w pixel tokens).
The tile-dense kernel (lft_tpu/kernels/spa_attn.py) runs, per query
tile, `num_heads` separate [nq, dh=16] x [dh, nk] matmuls -- a 16-deep
contraction uses ~12% of the 128x128 MXU. This kernel packs ALL heads
into full-depth contractions with the head-masked key replication trick
proven in kernels/ang_attn_mxu.py:

* per query tile: q_t [nq=128, E=128] keeps all channels;
* K_rep [H*KB, E]: head block h holds the tile's nk halo keys with all
  channels outside head h zeroed, padded to KB = 256 rows (lane-tile
  aligned). Built by VPU masking, no transposes or gathers;
* scores = q_t @ K_rep^T: ONE [128, 128] x [128, H*KB] full-depth MXU
  matmul yields every (query, head, key) score;
* the static window+bounds+pad mask (numpy-precomputed, streamed in) is
  shared across heads -- tiled H times along the lane axis;
* deferred-normalization row softmax: one row-wide max/exp, per-head
  normalizers from aligned KB-wide segment sums, divide folded in after
  the value matmul (see kernels/ang_attn_mxu.py);
* out = a @ V_rep: head-masked V_rep makes each output channel pick up
  exactly its own head's attention rows, so the [128, H*KB] x [H*KB, E]
  product directly produces the concatenated-head output.

The FLOP count is H x the minimal dense formulation, but every matmul is
full-depth/full-width on the MXU, which measures faster than the
fragmented alternative. Forward-only: training dispatch stays on the
tile-dense MXU VJP kernels via the hybrid custom-VJP in spa_attn.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lft_tpu.kernels.ang_attn_mxu import _seg_bcast_matrix, _seg_sums
from lft_tpu.kernels.spa_attn import pick_tile

KB = 256  # per-head key-column block (2 lane tiles; nk <= KB required)


@functools.lru_cache(maxsize=None)
def _np_consts(th: int, tw: int, r: int, h: int, w: int, num_heads: int,
               C: int):
    """(mask [n_tiles, th*tw, KB] -- head-independent, added per head
    block inside the kernel; head channel masks [H, C]). The window+
    bounds mask is spa_attn's tile mask with the key axis padded (pad
    columns masked out); the head masks are the shared builder."""
    from lft_tpu.kernels.ang_attn_mxu import head_channel_masks
    from lft_tpu.kernels.spa_attn import _np_tile_mask
    base = _np_tile_mask(th, tw, r, h, w)       # [n_tiles, nq, nk]
    nk = base.shape[-1]
    assert nk <= KB, (nk, KB)
    mask = np.full((base.shape[0], base.shape[1], KB), -1e30,
                   dtype=np.float32)
    mask[:, :, :nk] = base
    return mask, head_channel_masks(num_heads, C)


def _replicate(x_nk, hm_ref, num_heads):
    """[nk, C] halo keys -> [H*KB, C] head-blocked, zero-padded rows.
    One broadcast multiply (not H concats): rep[h, i, c] = x[i, c] * HM[h, c];
    the [H, KB, C] -> [H*KB, C] reshape is layout-free (row-major)."""
    nk, C = x_nk.shape
    xp = jnp.concatenate(
        [x_nk, jnp.zeros((KB - nk, C), x_nk.dtype)], axis=0)  # [KB, C]
    hm = hm_ref[:, :].astype(x_nk.dtype)                      # [H, C]
    rep = xp[None, :, :] * hm[:, None, :]
    return rep.reshape(num_heads * KB, C)


def _fwd_kernel(mask_ref, hm_ref, q_ref, k_ref, v_ref, o_ref, *,
                h, w, th, tw, r, num_heads, with_stats=False,
                m_ref=None, l_ref=None):
    """One grid step = `V` view images. q_ref [V, h, w, E]; k_ref/v_ref
    [V, h+2r, w+2r, E] zero-padded; mask_ref [n_tiles, nq, KB]. With
    `with_stats`, also writes the per-(tile, query, head) softmax max and
    denominator [V, n_tiles, nq, H] for the custom-VJP backward."""
    E = q_ref.shape[-1]
    hl_h, hl_w = th + 2 * r, tw + 2 * r
    nq, nk = th * tw, hl_h * hl_w
    scale = jnp.float32(float(E // num_heads) ** -0.5)

    for vi in range(q_ref.shape[0]):
        for ti in range(h // th):
            for tj in range(w // tw):
                q_t = q_ref[vi, ti * th:(ti + 1) * th,
                            tj * tw:(tj + 1) * tw, :]
                q_t = q_t.reshape(nq, E)
                k_t = k_ref[vi, ti * th:ti * th + hl_h,
                            tj * tw:tj * tw + hl_w, :]
                v_t = v_ref[vi, ti * th:ti * th + hl_h,
                            tj * tw:tj * tw + hl_w, :]
                k_rep = _replicate(k_t.reshape(nk, E), hm_ref, num_heads)
                v_rep = _replicate(v_t.reshape(nk, E), hm_ref, num_heads)
                t_idx = ti * (w // tw) + tj
                s = jax.lax.dot_general(
                    q_t, k_rep, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [nq, H*KB] MXU
                mask = mask_ref[t_idx]                    # [nq, KB] f32
                # the window+bounds mask is head-independent: tile it along
                # the lane axis so the whole row is masked at once
                s = s * scale + jnp.concatenate([mask] * num_heads, axis=-1)
                # Deferred-normalization row softmax (see
                # kernels/ang_attn_mxu.py): one row-wide max is an exact
                # shift for every head segment; per-head normalizers from
                # aligned KB-wide segment sums; the divide folds in after
                # the value matmul as a (1/l) @ HM broadcast. Replaces the
                # per-head max/exp/sum/div/concat loop with 4 full-width
                # ops.
                m = jnp.max(s, axis=-1, keepdims=True)    # [nq, 1]
                e = jnp.exp(s - m)                        # masked -> 0
                l = _seg_sums(e, num_heads, KB)           # [nq, H]
                out_raw = jax.lax.dot_general(
                    e.astype(v_rep.dtype), v_rep,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [nq, E] MXU
                o_t = out_raw * jnp.dot(
                    1.0 / l, hm_ref[:, :].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
                o_ref[vi, ti * th:(ti + 1) * th,
                      tj * tw:(tj + 1) * tw, :] = (
                    o_t.reshape(th, tw, E).astype(o_ref.dtype))
                if with_stats:
                    m_ref[vi, t_idx] = m + jnp.zeros((nq, num_heads),
                                                     jnp.float32)
                    l_ref[vi, t_idx] = l


def _bwd_kernel(mask_ref, hm_ref, seg_ref, q_ref, k_ref, v_ref, do_ref,
                m_ref, l_ref, dq_ref, dk_ref, dv_ref, *, h, w, th, tw, r,
                num_heads):
    """Head-packed dense-attention backward, same tile structure: every
    matmul is a full-depth MXU contraction (standard identities; dk/dv
    de-replicated via the head masks and accumulated into PADDED
    [V, h+2r, w+2r, E] buffers -- tiles run sequentially, so the
    read-modify-write is safe)."""
    E = q_ref.shape[-1]
    hl_h, hl_w = th + 2 * r, tw + 2 * r
    nq, nk = th * tw, hl_h * hl_w
    scale = jnp.float32(float(E // num_heads) ** -0.5)

    for vi in range(q_ref.shape[0]):
        dk_ref[vi] = jnp.zeros_like(dk_ref[vi])
        dv_ref[vi] = jnp.zeros_like(dv_ref[vi])
        for ti in range(h // th):
            for tj in range(w // tw):
                ysl = slice(ti * th, ti * th + hl_h)
                xsl = slice(tj * tw, tj * tw + hl_w)
                q_t = q_ref[vi, ti * th:(ti + 1) * th,
                            tj * tw:(tj + 1) * tw, :].reshape(nq, E)
                do_t = do_ref[vi, ti * th:(ti + 1) * th,
                              tj * tw:(tj + 1) * tw, :].reshape(nq, E)
                k_rep = _replicate(k_ref[vi, ysl, xsl, :].reshape(nk, E),
                                   hm_ref, num_heads)
                v_rep = _replicate(v_ref[vi, ysl, xsl, :].reshape(nk, E),
                                   hm_ref, num_heads)
                t_idx = ti * (w // tw) + tj
                mask = mask_ref[t_idx]                    # [nq, KB]
                m_t = m_ref[vi, t_idx]                    # [nq, H]
                l_t = l_ref[vi, t_idx]
                s = jax.lax.dot_general(
                    q_t, k_rep, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = s + jnp.concatenate([mask] * num_heads, axis=-1)
                dov = jax.lax.dot_general(
                    do_t, v_rep, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [nq, H*KB]
                # whole-row softmax recompute with Seg-broadcast stats
                # (see kernels/ang_attn_mxu.py's backward)
                seg = seg_ref[:, :]                       # [H, H*KB]
                m_b = jnp.dot(m_t, seg, preferred_element_type=jnp.float32)
                inv_b = jnp.dot(1.0 / l_t, seg,
                                preferred_element_type=jnp.float32)
                a_f = jnp.exp(s - m_b) * inv_b            # [nq, H*KB]
                D = _seg_sums(a_f * dov, num_heads, KB)   # [nq, H]
                D_b = jnp.dot(D, seg, preferred_element_type=jnp.float32)
                ds = (a_f * (dov - D_b) * scale).astype(q_t.dtype)
                a = a_f.astype(q_t.dtype)
                dq_t = jax.lax.dot_general(
                    ds, k_rep, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [nq, E]
                dq_ref[vi, ti * th:(ti + 1) * th,
                       tj * tw:(tj + 1) * tw, :] = (
                    dq_t.reshape(th, tw, E).astype(dq_ref.dtype))
                dk_rep = jax.lax.dot_general(
                    ds, q_t, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [H*KB, E]
                dv_rep = jax.lax.dot_general(
                    a, do_t, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dk_t = jnp.zeros((nk, E), jnp.float32)
                dv_t = jnp.zeros((nk, E), jnp.float32)
                for hd in range(num_heads):
                    hmv = hm_ref[hd:hd + 1, :].astype(jnp.float32)
                    dk_t = dk_t + dk_rep[hd * KB:hd * KB + nk] * hmv
                    dv_t = dv_t + dv_rep[hd * KB:hd * KB + nk] * hmv
                dk_ref[vi, ysl, xsl, :] = (dk_ref[vi, ysl, xsl, :]
                                           + dk_t.reshape(hl_h, hl_w, E))
                dv_ref[vi, ysl, xsl, :] = (dv_ref[vi, ysl, xsl, :]
                                           + dv_t.reshape(hl_h, hl_w, E))


def _geom(h, w, E, k, B, V):
    r = k // 2
    th, tw = pick_tile(h, w)
    n_tiles = (h // th) * (w // tw)
    nq = th * tw
    pad_b = (-B) % V
    img = pl.BlockSpec((V, h, w, E), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    pad = pl.BlockSpec((V, h + 2 * r, w + 2 * r, E), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((n_tiles, nq, KB), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    return r, th, tw, n_tiles, nq, pad_b, img, pad, mspec


def _pad_views(x, pad_b, r=0):
    if pad_b:
        x = jnp.pad(x, [(0, pad_b), (0, 0), (0, 0), (0, 0)])
    if r:
        x = jnp.pad(x, [(0, 0), (r, r), (r, r), (0, 0)])
    return x


def _fwd(q_img, k_img, v_img, num_heads, k, with_stats,
         views_per_step=None):
    B, h, w, E = q_img.shape
    # stats mode carries two extra f32 stat blocks per step: halve the
    # views-per-step so the scoped-VMEM stack stays under the 16 MB limit
    V = views_per_step or (2 if with_stats else 4)
    r, th, tw, n_tiles, nq, pad_b, img, pad, mspec = _geom(h, w, E, k, B, V)
    mask, hm = (jnp.asarray(c) for c in
                _np_consts(th, tw, r, h, w, num_heads, E))
    hm = hm.astype(q_img.dtype)
    q_p = _pad_views(q_img, pad_b)
    kp = _pad_views(k_img, pad_b, r)
    vp = _pad_views(v_img, pad_b, r)
    hspec = pl.BlockSpec((num_heads, E), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    interpret = jax.devices()[0].platform != "tpu"
    Bp = B + pad_b
    if not with_stats:
        kernel = functools.partial(_fwd_kernel, h=h, w=w, th=th, tw=tw, r=r,
                                   num_heads=num_heads, with_stats=False)
        out = pl.pallas_call(
            kernel, interpret=interpret, grid=(Bp // V,),
            in_specs=[mspec, hspec, img, pad, pad],
            out_specs=img,
            out_shape=jax.ShapeDtypeStruct((Bp, h, w, E), q_img.dtype),
        )(mask, hm, q_p, kp, vp)
        return out[:B], None, None
    stat = pl.BlockSpec((V, n_tiles, nq, num_heads),
                        lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    def kernel_stats(mm, hh, q, kk, vv, o, m, l):
        _fwd_kernel(mm, hh, q, kk, vv, o, h=h, w=w, th=th, tw=tw, r=r,
                    num_heads=num_heads, with_stats=True,
                    m_ref=m, l_ref=l)
    out, m, l = pl.pallas_call(
        kernel_stats, interpret=interpret, grid=(Bp // V,),
        in_specs=[mspec, hspec, img, pad, pad],
        out_specs=(img, stat, stat),
        out_shape=(jax.ShapeDtypeStruct((Bp, h, w, E), q_img.dtype),
                   jax.ShapeDtypeStruct((Bp, n_tiles, nq, num_heads),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((Bp, n_tiles, nq, num_heads),
                                        jnp.float32)),
    )(mask, hm, q_p, kp, vp)
    return out[:B], m[:B], l[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def windowed_attention_headpacked(q_img, k_img, v_img, num_heads: int,
                                  k: int):
    """Differentiable head-packed windowed attention on [B, h, w, E]
    projected q/k/v (window k x k). Requires a valid `pick_tile(h, w)`
    whose halo fits KB rows and E % num_heads == 0 (see
    `headpacked_applicable`). Four views are processed per grid step to
    amortize per-step DMA setup (B is padded to a multiple; pad views
    are dropped on return)."""
    out, _, _ = _fwd(q_img, k_img, v_img, num_heads, k, with_stats=False)
    return out


def _vjp_fwd(q_img, k_img, v_img, num_heads, k):
    out, m, l = _fwd(q_img, k_img, v_img, num_heads, k, with_stats=True)
    return out, (q_img, k_img, v_img, m, l)


def _vjp_bwd(num_heads, k, res, dout):
    q_img, k_img, v_img, m, l = res
    B, h, w, E = q_img.shape
    V = 1  # backward holds f32 dk/dv accumulators + full-width scratch per
           # tile; V=2 overflows the 16 MB scoped-VMEM stack by ~1 MB
    r, th, tw, n_tiles, nq, pad_b, img, pad, mspec = _geom(h, w, E, k, B, V)
    mask, hm = (jnp.asarray(c) for c in
                _np_consts(th, tw, r, h, w, num_heads, E))
    seg = jnp.asarray(_seg_bcast_matrix(num_heads, KB))
    from lft_tpu.kernels.common import bwd_io_dtype
    io_dtype = bwd_io_dtype(q_img.dtype)
    hm = hm.astype(io_dtype)
    q_p = _pad_views(q_img.astype(io_dtype), pad_b)
    kp = _pad_views(k_img.astype(io_dtype), pad_b, r)
    vp = _pad_views(v_img.astype(io_dtype), pad_b, r)
    do_p = _pad_views(dout.astype(io_dtype), pad_b)
    # (statically dead at V=1 since pad_b == 0, but kept live-by-derivation:
    # if V is ever raised, pad views need stats too -- denominator 1 avoids
    # exp(x)/0 on them; their grads are dropped on return)
    spad = [(0, pad_b), (0, 0), (0, 0), (0, 0)]
    m_p = jnp.pad(m, spad) if pad_b else m
    l_p = jnp.pad(l, spad) if pad_b else l
    if pad_b:
        l_p = l_p.at[B:].set(1.0)
    hspec = pl.BlockSpec((num_heads, E), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((V, n_tiles, nq, num_heads),
                        lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    interpret = jax.devices()[0].platform != "tpu"
    Bp = B + pad_b
    kernel = functools.partial(_bwd_kernel, h=h, w=w, th=th, tw=tw, r=r,
                               num_heads=num_heads)
    segspec = pl.BlockSpec((num_heads, num_heads * KB), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    dq, dk_pad, dv_pad = pl.pallas_call(
        kernel, interpret=interpret, grid=(Bp // V,),
        in_specs=[mspec, hspec, segspec, img, pad, pad, img, stat, stat],
        out_specs=(img, pad, pad),
        out_shape=(jax.ShapeDtypeStruct((Bp, h, w, E), q_img.dtype),
                   jax.ShapeDtypeStruct((Bp, h + 2 * r, w + 2 * r, E),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((Bp, h + 2 * r, w + 2 * r, E),
                                        jnp.float32)),
    )(mask, hm, seg, q_p, kp, vp, do_p, m_p, l_p)
    dk = dk_pad[:B, r:r + h, r:r + w, :].astype(k_img.dtype)
    dv = dv_pad[:B, r:r + h, r:r + w, :].astype(v_img.dtype)
    return dq[:B], dk, dv


windowed_attention_headpacked.defvjp(_vjp_fwd, _vjp_bwd)


def headpacked_applicable(h: int, w: int, E: int, num_heads: int,
                          k: int) -> bool:
    tile = pick_tile(h, w)
    if tile is None or E % num_heads:
        return False
    th, tw = tile
    r = k // 2
    return (th + 2 * r) * (tw + 2 * r) <= KB
