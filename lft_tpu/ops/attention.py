"""Multi-head attention ops.

Two consumers (reference model/LFT.py):

* **Angular attention** -- full MHSA over the A^2 = 25 view tokens
  (reference model/LFT.py:194-238). Tiny sequence; a plain batched einsum
  attention is already MXU-friendly.
* **Spatial attention** -- MHSA over the h*w pixel tokens restricted to a
  local `k x k` (default 5x5) window. The reference implements this as a
  dense additive `-inf` mask of shape `[(hw), (hw)]` rebuilt every forward
  (reference model/LFT.py:147-162,177) -- O((hw)^2) memory *and* compute.
  Here the same math has three interchangeable implementations:
    - `dense`: static precomputed mask + full attention (parity baseline);
    - `tiled`: queries are tiled into `t x t` blocks, keys/values into
      `(t+2r) x (t+2r)` halo blocks; attention runs per tile with an exact
      static mask. For a 32x32 patch with t=8, k=5 this does 144/1024 = 14%
      of the dense FLOPs and never materializes an (hw)^2 object;
    - `pallas`: fused kernel (lft_tpu/kernels/) -- selected when profitable.

Weights follow torch `nn.MultiheadAttention` exactly (packed
`in_proj_weight [3E, E]`, rows [Wq; Wk; Wv]; `out_proj.weight [E, E]`; no
biases -- reference model/LFT.py:128-134,200-205), so converted checkpoints
reproduce the reference bit-for-bit-close.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative instead of -inf: same softmax result for
                 # rows with >=1 valid key (always true: the query itself),
                 # and avoids NaN from (-inf) - (-inf) in max-subtraction.


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[..., T, E] -> [..., H, T, dh] (torch head layout: E split into
    consecutive chunks of dh)."""
    *lead, T, E = x.shape
    dh = E // num_heads
    x = x.reshape(*lead, T, num_heads, dh)
    return jnp.moveaxis(x, -2, -3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[..., H, T, dh] -> [..., T, E]."""
    *lead, H, T, dh = x.shape
    x = jnp.moveaxis(x, -3, -2)
    return x.reshape(*lead, T, H * dh)


def multi_head_attention(q_in: jnp.ndarray, k_in: jnp.ndarray, v_in: jnp.ndarray,
                         in_proj_weight: jnp.ndarray, out_proj_weight: jnp.ndarray,
                         num_heads: int, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """torch-parity MHA over the -2 axis of [..., T, E] inputs.

    `mask` (optional) is additive, broadcastable to [..., H, Tq, Tk].
    Reproduces torch's q-scaling-before-matmul and packed projections.
    """
    E = q_in.shape[-1]
    dh = E // num_heads
    wq, wk, wv = jnp.split(in_proj_weight, 3, axis=0)   # each [E, E]
    q = q_in @ wq.T
    k = k_in @ wk.T
    v = v_in @ wv.T
    q = _split_heads(q, num_heads) * jnp.asarray(dh, q.dtype) ** -0.5
    k = _split_heads(k, num_heads)
    v = _split_heads(v, num_heads)
    scores = jnp.einsum("...qd,...kd->...qk", q, k)
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("...qk,...kd->...qd", attn, v)
    out = _merge_heads(out)
    return out @ out_proj_weight.T


@functools.lru_cache(maxsize=None)
def local_window_mask(h: int, w: int, k: int) -> np.ndarray:
    """Dense additive mask [(h w), (h w)]: 0 where |di|<=k//2 and |dj|<=k//2,
    NEG_INF elsewhere. Equals reference `SpaTrans.gen_mask`
    (model/LFT.py:147-162) for square inputs (the reference's `min(h, ...)`
    w-bound quirk only diverges for h != w, which the pipeline never uses).
    Static per (h, w, k): computed once in numpy, constant under jit.
    """
    r_lo = k // 2
    r_hi = k - r_lo - 1
    ii = np.arange(h)
    jj = np.arange(w)
    di = ii[:, None] - ii[None, :]                    # qi - ki
    dj = jj[:, None] - jj[None, :]
    ok_i = (di <= r_lo) & (-di <= r_hi)               # ki in [qi-r_lo, qi+r_hi]
    ok_j = (dj <= r_lo) & (-dj <= r_hi)
    ok = ok_i[:, None, :, None] & ok_j[None, :, None, :]   # [h, w, h, w]
    mask = np.where(ok, 0.0, NEG_INF).astype(np.float32)
    return mask.reshape(h * w, h * w)


@functools.lru_cache(maxsize=None)
def _halo_mask(h: int, w: int, t: int, k: int) -> np.ndarray:
    """Static additive mask [nth, ntw, t*t, (t+2r)^2] for tiled local
    attention. r = k//2 (k odd). Entry (ti,tj,q,kk) is 0 iff halo key kk is
    in-bounds and within the k x k window of query q."""
    r = k // 2
    assert k == 2 * r + 1, "tiled path assumes odd window"
    nth, ntw = h // t, w // t
    hl = t + 2 * r
    qi = np.arange(t)
    ki = np.arange(hl) - r                             # halo-local -> tile-local
    # window test is translation invariant within a tile
    ok_row = np.abs(qi[:, None] - ki[None, :]) <= r    # [t, hl]
    mask = np.full((nth, ntw, t, t, hl, hl), NEG_INF, dtype=np.float32)
    for ti in range(nth):
        gi = ti * t + ki                               # global row of halo key
        in_i = (gi >= 0) & (gi < h)
        for tj in range(ntw):
            gj = tj * t + ki
            in_j = (gj >= 0) & (gj < w)
            ok = (ok_row[:, None, :, None] & ok_row[None, :, None, :]
                  & in_i[None, None, :, None] & in_j[None, None, None, :])
            mask[ti, tj] = np.where(ok, 0.0, NEG_INF)
    return mask.reshape(nth, ntw, t * t, hl * hl)


def _pick_tile(h: int, w: int) -> int | None:
    """Choose a query tile size dividing both dims; None -> use dense."""
    for t in (8, 16, 4, 32):
        if h % t == 0 and w % t == 0 and h >= t and w >= t:
            return t
    return None


def _extract_halo(x: jnp.ndarray, t: int, r: int) -> jnp.ndarray:
    """[B, h, w, E] -> [B, nth, ntw, (t+2r)^2, E] overlapping halo blocks."""
    B, h, w, E = x.shape
    hl = t + 2 * r
    xp = jnp.pad(x, [(0, 0), (r, r), (r, r), (0, 0)])
    patches = jax.lax.conv_general_dilated_patches(
        xp, filter_shape=(hl, hl), window_strides=(t, t), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # feature dim ordering: input-channel slowest -> [E, hl, hl]
    nth, ntw = patches.shape[1], patches.shape[2]
    patches = patches.reshape(B, nth, ntw, E, hl * hl)
    return jnp.moveaxis(patches, -2, -1)               # [B, nth, ntw, hl^2, E]


def local_attention_tiled(qn: jnp.ndarray, v: jnp.ndarray,
                          in_proj_weight: jnp.ndarray, out_proj_weight: jnp.ndarray,
                          num_heads: int, k: int, t: int) -> jnp.ndarray:
    """Exact local-window MHA over image tokens via query tiles + key halos.

    qn: [B, h, w, E] normed tokens (queries AND keys -- the reference uses
        q = k = normed, v = raw, model/LFT.py:183-187);
    v:  [B, h, w, E] raw tokens.
    Returns [B, h, w, E].
    """
    B, h, w, E = qn.shape
    r = k // 2
    dh = E // num_heads
    wq, wk, wv = jnp.split(in_proj_weight, 3, axis=0)
    q_img = qn @ wq.T
    k_img = qn @ wk.T
    v_img = v @ wv.T

    nth, ntw = h // t, w // t
    q_t = q_img.reshape(B, nth, t, ntw, t, E).transpose(0, 1, 3, 2, 4, 5)
    q_t = q_t.reshape(B, nth, ntw, t * t, E)
    k_t = _extract_halo(k_img, t, r)                   # [B, nth, ntw, hl^2, E]
    v_t = _extract_halo(v_img, t, r)

    hl2 = k_t.shape[3]
    q_t = q_t.reshape(B, nth, ntw, t * t, num_heads, dh)
    k_t = k_t.reshape(B, nth, ntw, hl2, num_heads, dh)
    v_t = v_t.reshape(B, nth, ntw, hl2, num_heads, dh)
    scale = jnp.asarray(dh, q_t.dtype) ** -0.5
    scores = jnp.einsum("bijqnd,bijknd->bnijqk", q_t * scale, k_t)
    mask = jnp.asarray(_halo_mask(h, w, t, k))         # [nth, ntw, t^2, hl^2]
    scores = scores + mask[None, None]
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bnijqk,bijknd->bijqnd", attn, v_t)
    out = out.reshape(B, nth, ntw, t, t, E).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, h, w, E)
    return out @ out_proj_weight.T


def local_attention(qn: jnp.ndarray, v: jnp.ndarray,
                    in_proj_weight: jnp.ndarray, out_proj_weight: jnp.ndarray,
                    num_heads: int, k: int = 5, impl: str = "auto") -> jnp.ndarray:
    """Local-window spatial MHA over [B, h, w, E] token images.

    impl: 'auto' | 'dense' | 'tiled' | 'pallas'.
    """
    B, h, w, E = qn.shape
    if impl == "auto" and E % num_heads == 0 \
            and jax.devices()[0].platform == "tpu":
        impl = "pallas"  # fused kernel: fastest on real TPUs
    if impl == "pallas":
        from lft_tpu.kernels.local_attn import local_attention_pallas
        return local_attention_pallas(qn, v, in_proj_weight, out_proj_weight,
                                      num_heads=num_heads, k=k)
    t = _pick_tile(h, w)
    if impl == "tiled" or (impl == "auto" and t is not None):
        if t is None:
            raise ValueError(f"no valid tile size for ({h}, {w}); use impl='dense'")
        return local_attention_tiled(qn, v, in_proj_weight, out_proj_weight,
                                     num_heads, k, t)
    # dense fallback: full attention with the static window mask
    mask = jnp.asarray(local_window_mask(h, w, k))
    q_seq = qn.reshape(B, h * w, E)
    v_seq = v.reshape(B, h * w, E)
    out = multi_head_attention(q_seq, q_seq, v_seq, in_proj_weight,
                               out_proj_weight, num_heads, mask=mask)
    return out.reshape(B, h, w, E)
