"""Full-scene patch tiling: LFdivide / LFintegrate, TPU-style.

The reference scales to arbitrarily large scenes by tiling each view into
overlapping `patch_size` windows at `stride`, running the network per patch
(serially, batch 1! reference test.py:88-95), and stitching the central
`stride x stride` crops back (reference utils/utils.py:91-157).

Here the same semantics become static-shaped, fully vectorized ops:

* `lf_divide` = symmetric-pad each view by the halo `bdr=(patch-stride)//2`
  (reference `ImageExtend`, utils/utils.py:126-138, is exactly mirror-with-
  edge padding), zero-extend to the window-covering extent `hE/wE` like the
  reference's zero-initialized `dataE` (utils/utils.py:109), then one gather
  produces the whole `[numU*numV, A*patch, A*patch]` patch batch.
* `lf_integrate` = crop the central `stride` block of every SR patch and
  reassemble by pure reshape/transpose (the crops tile exactly), then crop
  to `[h0, w0]`. Zeros from the `hE/wE` extension never reach the output
  (central-crop rows stay < h0 + bdr <= h).

Both jit cleanly; all loop structure is static Python over nothing -- the
data path is reshapes plus two `take`s.

Note: reference `LFintegrate` has a latent h-vs-w index quirk
(utils/utils.py:153 uses `v*ph` in a w-slice end). For the square patches the
pipeline always uses, behavior is identical; we implement the square-correct
form (SURVEY.md §7 hard-parts (e)).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def tiling_grid(h0: int, w0: int, patch_size: int, stride: int):
    """Static tiling geometry, matching reference utils/utils.py:93-107.

    Returns dict(bdr, h, w, numU, numV, hE, wE).
    """
    bdr = (patch_size - stride) // 2
    h = h0 + 2 * bdr
    w = w0 + 2 * bdr
    numU = (h - patch_size) // stride + (2 if (h - patch_size) % stride else 1)
    numV = (w - patch_size) // stride + (2 if (w - patch_size) % stride else 1)
    hE = stride * (numU - 1) + patch_size
    wE = stride * (numV - 1) + patch_size
    return dict(bdr=bdr, h=h, w=w, numU=numU, numV=numV, hE=hE, wE=wE)


def image_extend(im: jnp.ndarray, bdr: int) -> jnp.ndarray:
    """Mirror-with-edge padding by `bdr` on both spatial dims of [..., h, w].

    Equivalent to reference `ImageExtend` (utils/utils.py:126-138), which
    tiles 3x3 flipped copies and center-crops `[h-bdr : 2h+bdr]`: the result
    is symmetric (edge-including) reflection. Requires bdr <= min(h, w).
    """
    if bdr == 0:
        return im
    pad = [(0, 0)] * (im.ndim - 2) + [(bdr, bdr), (bdr, bdr)]
    return jnp.pad(im, pad, mode="symmetric")


def lf_divide(mosaic: jnp.ndarray, ang_res: int, patch_size: int, stride: int) -> jnp.ndarray:
    """Split a 2-D SAI mosaic `[A*h0, A*w0]` into overlapping patch mosaics.

    Returns `[numU, numV, A*patch_size, A*patch_size]`, bit-matching
    reference `LFdivide` (utils/utils.py:91-123).
    """
    H, W = mosaic.shape
    a = ang_res
    h0, w0 = H // a, W // a
    g = tiling_grid(h0, w0, patch_size, stride)
    bdr, h, w = g["bdr"], g["h"], g["w"]
    numU, numV, hE, wE = g["numU"], g["numV"], g["hE"], g["wE"]

    views = mosaic.reshape(a, h0, a, w0).transpose(0, 2, 1, 3)      # [a, a, h0, w0]
    ext = image_extend(views, bdr)                                   # [a, a, h, w]
    ext = jnp.pad(ext, [(0, 0), (0, 0), (0, hE - h), (0, wE - w)])   # zero-extend

    idx_u = (np.arange(numU)[:, None] * stride + np.arange(patch_size)[None, :]).reshape(-1)
    idx_v = (np.arange(numV)[:, None] * stride + np.arange(patch_size)[None, :]).reshape(-1)
    t = jnp.take(ext, jnp.asarray(idx_u), axis=2)                    # [a, a, numU*p, wE]
    t = jnp.take(t, jnp.asarray(idx_v), axis=3)                      # [a, a, numU*p, numV*p]
    t = t.reshape(a, a, numU, patch_size, numV, patch_size)
    t = t.transpose(2, 4, 0, 3, 1, 5)                                # [numU, numV, a, p, a, p]
    return t.reshape(numU, numV, a * patch_size, a * patch_size)


def lf_integrate(patches: jnp.ndarray, ang_res: int, patch_size: int, stride: int,
                 h0: int, w0: int) -> jnp.ndarray:
    """Stitch SR patch mosaics back into per-view output `[A, A, h0, w0]`.

    `patches` is `[numU, numV, A*patch_size, A*patch_size]` (SR scale already
    applied to patch_size/stride/h0/w0, as in reference test.py:97-99).
    Bit-matches reference `LFintegrate` (utils/utils.py:141-157) for the
    square patches the pipeline uses.
    """
    numU, numV, PH, PW = patches.shape
    a = ang_res
    bdr = (patch_size - stride) // 2
    p = PH // a
    v = patches.reshape(numU, numV, a, p, a, p)
    c = v[:, :, :, bdr:bdr + stride, :, bdr:bdr + stride]            # central crops
    c = c.transpose(2, 4, 0, 3, 1, 5)                                # [a, a, numU, s, numV, s]
    c = c.reshape(a, a, numU * stride, numV * stride)
    return c[:, :, :h0, :w0]


def views_4d_to_mosaic(views: jnp.ndarray) -> jnp.ndarray:
    """[A, A, h, w] -> [A*h, A*w] SAI mosaic (reference test.py:100-101's
    `permute(0, 2, 1, 3).reshape(...)`)."""
    a1, a2, h, w = views.shape
    return views.transpose(0, 2, 1, 3).reshape(a1 * h, a2 * w)
