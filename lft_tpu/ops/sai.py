"""Sub-aperture-image (SAI) mosaic <-> view-tensor reshapes.

A light field of `A x A` views, each `h x w`, is stored by the reference as a
single 2-D "SAI mosaic" of shape `[A*h, A*w]` laid out view-major: mosaic
block (u, v) of size h x w is view (u, v) (reference model/LFT.py:58,79).

All functions here are pure reshape/transpose compositions with static
shapes; under jit XLA lowers them to (mostly free) layout changes.

Layout convention inside the framework is channels-last:
  mosaic  [..., A*h, A*w, C]
  views   [..., A*A, h, w, C]       (angular axis folded)
  grid    [..., A, A, h, w, C]      (explicit angular grid)
"""

from __future__ import annotations

import jax.numpy as jnp


def mosaic_to_view_grid(x: jnp.ndarray, ang_res: int) -> jnp.ndarray:
    """[..., A*h, A*w, C] -> [..., A, A, h, w, C]."""
    *lead, H, W, C = x.shape
    a = ang_res
    h, w = H // a, W // a
    x = x.reshape(*lead, a, h, a, w, C)   # [..., a1, h, a2, w, C]
    return jnp.moveaxis(x, -3, -4)        # [..., a1, a2, h, w, C]


def view_grid_to_mosaic(x: jnp.ndarray, ang_res: int = None) -> jnp.ndarray:
    """[..., A, A, h, w, C] -> [..., A*h, A*w, C]."""
    *lead, a1, a2, h, w, C = x.shape
    x = jnp.moveaxis(x, -4, -3)  # [..., a1, h, a2, w, C]
    return x.reshape(*lead, a1 * h, a2 * w, C)


def mosaic_to_views(x: jnp.ndarray, ang_res: int) -> jnp.ndarray:
    """[..., A*h, A*w, C] -> [..., A*A, h, w, C].

    Matches the reference's `rearrange(lr, 'b c (a1 h) (a2 w) -> b c (a1 a2) h w')`
    (reference model/LFT.py:58) with channels-last layout: view index
    `v = a1 * A + a2` (row-major over the angular grid).
    """
    *lead, H, W, C = x.shape
    a = ang_res
    g = mosaic_to_view_grid(x, a)
    return g.reshape(*lead, a * a, H // a, W // a, C)


def views_to_mosaic(x: jnp.ndarray, ang_res: int) -> jnp.ndarray:
    """[..., A*A, h, w, C] -> [..., A*h, A*w, C] (inverse of mosaic_to_views;
    reference model/LFT.py:79)."""
    *lead, aa, h, w, C = x.shape
    a = ang_res
    g = x.reshape(*lead, a, a, h, w, C)
    return view_grid_to_mosaic(g)


def flip_sai(data: jnp.ndarray, ang_res: int) -> jnp.ndarray:
    """Flip a light field along all four (U, V, H, W) axes.

    Parity port of the (dead-code) reference helper
    `flip_SAI` (reference utils/utils_datasets.py:101-111): input is an
    `[H, W]` or `[H, W, C]` SAI mosaic stored U-major over rows; both the
    angular order and the per-view pixels are reversed.
    """
    squeeze = data.ndim == 2
    if squeeze:
        data = data[..., None]
    H, W, C = data.shape
    a = ang_res
    d = data.reshape(a, H // a, a, W // a, C)
    d = d[::-1, ::-1, ::-1, ::-1, :]
    d = d.reshape(H, W, C)
    return d[..., 0] if squeeze else d


def crop_center_view(data: jnp.ndarray, ang_res_in: int, ang_res_out: int) -> jnp.ndarray:
    """Central angular crop of an SAI mosaic batch.

    Parity port of the (dead-code) reference helper `crop_center_view`
    (reference utils/utils.py:186-194); here on `[..., A*h, A*w, C]`.
    """
    assert ang_res_in >= ang_res_out, "angRes_in must be >= angRes_out"
    *lead, H, W, C = data.shape
    ps = H // ang_res_in
    lo = (ang_res_in - ang_res_out) // 2 * ps
    hi = (ang_res_in + ang_res_out) // 2 * ps
    return data[..., lo:hi, lo:hi, :]
