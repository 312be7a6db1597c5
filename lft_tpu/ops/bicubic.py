"""Bicubic resampling, TPU-style: separable resize as two dense matmuls.

Two distinct bicubic variants exist in the reference and they are NOT
interchangeable (parity-critical):

* **torch-style** (`F.interpolate(mode='bicubic', align_corners=False)`,
  reference model/LFT.py:261): Keys cubic with a = -0.75, half-pixel centers,
  border-replicate, no antialiasing. Used for the per-view upscale skip path.
* **matlab-style** (`utils/imresize.py`, and the Matlab generators'
  `imresize`): Keys cubic with a = -0.5, antialiasing when downscaling,
  symmetric boundary, weight renormalization. Used offline to create the LR
  training/test data.

Both are expressed here as precomputed dense resize matrices `[out, in]`
(numpy, computed at trace time, constant-folded under jit), applied as
`Wh @ img @ Ww.T`. On TPU this turns resampling into two MXU matmuls with
static shapes -- no gathers, no dynamic control flow.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax.numpy as jnp


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic convolution kernel with parameter `a`."""
    absx = np.abs(x)
    absx2 = absx * absx
    absx3 = absx2 * absx
    f = ((a + 2.0) * absx3 - (a + 3.0) * absx2 + 1.0) * (absx <= 1.0)
    f = f + (a * absx3 - 5.0 * a * absx2 + 8.0 * a * absx - 4.0 * a) * ((absx > 1.0) & (absx <= 2.0))
    return f


@functools.lru_cache(maxsize=None)
def resize_matrix_torch(in_len: int, out_len: int) -> np.ndarray:
    """[out_len, in_len] float32 matrix reproducing
    `F.interpolate(mode='bicubic', align_corners=False)` along one dim
    (reference model/LFT.py:261): a = -0.75, src = (dst+0.5)/scale - 0.5,
    4 taps at floor(src)-1..+2, indices clamped to the border (replicate)."""
    scale = out_len / in_len
    a = -0.75
    W = np.zeros((out_len, in_len), dtype=np.float64)
    for i in range(out_len):
        src = (i + 0.5) / scale - 0.5
        i0 = math.floor(src)
        for k in range(-1, 3):
            idx = i0 + k
            w = _cubic_kernel(np.array(src - idx), a)
            idx = min(max(idx, 0), in_len - 1)
            W[i, idx] += float(w)
    return W.astype(np.float32)


def _triangle_kernel(x: np.ndarray) -> np.ndarray:
    """Bilinear (triangle) kernel: parity port of reference
    utils/imresize.py:17-22."""
    x = np.asarray(x, dtype=np.float64)
    return (x + 1.0) * ((x >= -1.0) & (x < 0.0)) \
        + (1.0 - x) * ((x >= 0.0) & (x <= 1.0))


@functools.lru_cache(maxsize=None)
def resize_matrix_matlab(in_len: int, out_len: int,
                         kernel: str = "cubic") -> np.ndarray:
    """[out_len, in_len] float32 matrix reproducing Matlab `imresize`
    along one dim (faithful to reference utils/imresize.py:32-52):
    antialiasing when scale < 1 (kernel stretched by 1/scale and scaled),
    taps renormalized to sum 1, symmetric (mirror-with-edge) boundary via
    the reference's `aux` index folding.

    kernel='cubic' (a = -0.5 Keys kernel, the data-generation path) or
    'triangle' (bilinear, reference utils/imresize.py:101-107's
    method='bilinear' branch -- note the reference keeps kernel_width 4.0
    for it too, which is harmless since taps renormalize)."""
    scale = out_len / in_len
    a = -0.5
    base = (functools.partial(_cubic_kernel, a=a) if kernel == "cubic"
            else _triangle_kernel)
    k_width = 4.0
    if scale < 1.0:
        kernel_fn = lambda x: scale * base(scale * np.asarray(x, dtype=np.float64))
        kernel_width = k_width / scale
    else:
        kernel_fn = lambda x: base(np.asarray(x, dtype=np.float64))
        kernel_width = k_width
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1.0 - 1.0 / scale)
    left = np.floor(u - kernel_width / 2.0)
    P = int(math.ceil(kernel_width)) + 2
    ind = left[:, None] + np.arange(P)[None, :] - 1.0
    indices = ind.astype(np.int64)
    weights = kernel_fn(u[:, None] - indices - 1.0)
    weights = weights / np.sum(weights, axis=1, keepdims=True)
    # symmetric boundary folding (reference utils/imresize.py:47-48)
    aux = np.concatenate([np.arange(in_len), np.arange(in_len - 1, -1, -1)]).astype(np.int64)
    indices = aux[np.mod(indices, aux.size)]
    W = np.zeros((out_len, in_len), dtype=np.float64)
    for i in range(out_len):
        np.add.at(W[i], indices[i], weights[i])
    return W.astype(np.float32)


def resize2d(img: jnp.ndarray, out_hw, method: str = "torch") -> jnp.ndarray:
    """Resize the trailing two spatial dims of `img [..., H, W]` to `out_hw`.

    method='torch'  -> F.interpolate(bicubic, align_corners=False) parity
    method='matlab' -> Matlab imresize parity (antialiased when downscaling)
    """
    *lead, H, W = img.shape
    oh, ow = out_hw
    mat = resize_matrix_torch if method == "torch" else resize_matrix_matlab
    Wh = jnp.asarray(mat(H, oh))   # [oh, H]
    Ww = jnp.asarray(mat(W, ow))   # [ow, W]
    # two single large GEMMs (batch folded into M) instead of per-image
    # batched matmuls -- XLA's batched [oh, H, W] dots fragment on the MXU
    x = img.astype(jnp.float32).reshape(-1, H, W)
    B = x.shape[0]
    x = x.transpose(0, 2, 1).reshape(B * W, H) @ Wh.T      # [B*W, oh]
    x = x.reshape(B, W, oh).transpose(0, 2, 1).reshape(B * oh, W) @ Ww.T
    return x.reshape(*lead, oh, ow)


def bicubic_upscale_views(mosaic: jnp.ndarray, ang_res: int, scale: int) -> jnp.ndarray:
    """Per-view torch-bicubic x`scale` upscale of an SAI mosaic.

    Parity port of the reference skip path `interpolate(x, angRes, S,
    'bicubic')` (reference model/LFT.py:255-266): split the `[..., A*h, A*w]`
    mosaic into views, upscale each view independently, and re-mosaic.
    Implemented as two static matmuls applied to the view tensor.
    """
    *lead, H, W = mosaic.shape
    a = ang_res
    h, w = H // a, W // a
    v = mosaic.reshape(*lead, a, h, a, w)
    v = jnp.moveaxis(v, -2, -3)                    # [..., a, a, h, w]
    v = resize2d(v, (h * scale, w * scale), method="torch")
    v = jnp.moveaxis(v, -3, -2)                    # [..., a, h*S, a, w*S]
    return v.reshape(*lead, H * scale, W * scale)


def imresize(img, scalar_scale=None, output_shape=None, method: str = "matlab"):
    """Matlab-imresize-compatible entry point (numpy in / numpy out), the
    Matlab-free replacement for reference utils/imresize.py:101-139 used by
    the data generators. Operates on [H, W] or [H, W, C] float arrays.

    method: 'matlab' (== the reference's 'bicubic'), 'bilinear' (the
    reference's triangle-kernel branch, utils/imresize.py:101-107), or
    'torch' (F.interpolate parity, not a reference imresize mode)."""
    img = np.asarray(img)
    if scalar_scale is not None:
        out_h = int(math.ceil(scalar_scale * img.shape[0]))
        out_w = int(math.ceil(scalar_scale * img.shape[1]))
    elif output_shape is not None:
        out_h, out_w = int(output_shape[0]), int(output_shape[1])
    else:
        raise ValueError("scalar_scale OR output_shape must be given")
    if method in ("matlab", "bicubic"):
        mat = resize_matrix_matlab
    elif method == "bilinear":
        mat = functools.partial(resize_matrix_matlab, kernel="triangle")
    elif method == "torch":
        mat = resize_matrix_torch
    else:
        raise ValueError(f"unknown imresize method {method!r}")
    Wh = mat(img.shape[0], out_h).astype(np.float64)
    Ww = mat(img.shape[1], out_w).astype(np.float64)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    out = np.einsum("ph,hwc->pwc", Wh, img.astype(np.float64))
    out = np.einsum("qw,pwc->pqc", Ww, out)
    if squeeze:
        out = out[:, :, 0]
    return out
