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
* softmax per 256-wide head block (aligned slices, f32 VPU);
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
                h, w, th, tw, r, num_heads):
    """One grid step = one view image. q_ref [1, h, w, E]; k_ref/v_ref
    [1, h+2r, w+2r, E] zero-padded; mask_ref [n_tiles, nq, H*KB]."""
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
                s = s * scale
                mask = mask_ref[t_idx]                    # [nq, KB] f32
                # per-head softmax over aligned 256-wide lane slices. (A
                # "vectorized" [nq, H, KB] reshape variant lowers to a
                # pathological Mosaic relayout -- compile never finishes.)
                a_blocks = []
                for hd in range(num_heads):
                    blk = s[:, hd * KB:(hd + 1) * KB] + mask
                    m = jnp.max(blk, axis=-1, keepdims=True)
                    e = jnp.exp(blk - m)
                    a_blocks.append(e / jnp.sum(e, axis=-1, keepdims=True))
                a = jnp.concatenate(a_blocks, axis=-1).astype(v_rep.dtype)
                o_t = jax.lax.dot_general(
                    a, v_rep, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [nq, E] MXU
                o_ref[vi, ti * th:(ti + 1) * th,
                      tj * tw:(tj + 1) * tw, :] = (
                    o_t.reshape(th, tw, E).astype(o_ref.dtype))


def windowed_attention_headpacked(q_img, k_img, v_img, num_heads: int,
                                  k: int, views_per_step: int = 4):
    """Forward-only head-packed windowed attention on [B, h, w, E]
    projected q/k/v (window k x k). Requires a valid `pick_tile(h, w)`
    whose halo fits KB rows and E % num_heads == 0. `views_per_step`
    views are processed per grid step to amortize per-step DMA setup
    (B is padded to a multiple; pad views are dropped on return)."""
    B, h, w, E = q_img.shape
    r = k // 2
    th, tw = pick_tile(h, w)
    n_tiles = (h // th) * (w // tw)
    nq = th * tw
    V = views_per_step
    pad_b = (-B) % V
    if pad_b:
        zb = [(0, pad_b), (0, 0), (0, 0), (0, 0)]
        q_img = jnp.pad(q_img, zb)
        k_img = jnp.pad(k_img, zb)
        v_img = jnp.pad(v_img, zb)
    mask, hm = (jnp.asarray(c) for c in
                _np_consts(th, tw, r, h, w, num_heads, E))
    hm = hm.astype(q_img.dtype)
    kp = jnp.pad(k_img, [(0, 0), (r, r), (r, r), (0, 0)])
    vp = jnp.pad(v_img, [(0, 0), (r, r), (r, r), (0, 0)])
    img = pl.BlockSpec((V, h, w, E), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    pad = pl.BlockSpec((V, h + 2 * r, w + 2 * r, E), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((n_tiles, nq, KB), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((num_heads, E), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, h=h, w=w, th=th, tw=tw, r=r,
                               num_heads=num_heads)
    interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        kernel, interpret=interpret, grid=((B + pad_b) // V,),
        in_specs=[mspec, hspec, img, pad, pad],
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct((B + pad_b, h, w, E), q_img.dtype),
    )(mask, hm, q_img, kp, vp)
    return out[:B]


def headpacked_applicable(h: int, w: int, E: int, num_heads: int,
                          k: int) -> bool:
    tile = pick_tile(h, w)
    if tile is None or E % num_heads:
        return False
    th, tw = tile
    r = k // 2
    return (th + 2 * r) * (tw + 2 * r) <= KB
