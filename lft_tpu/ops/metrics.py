"""On-device PSNR / SSIM, skimage-semantics-compatible.

The reference evaluates per-view Y-channel PSNR/SSIM with
`skimage.metrics.peak_signal_noise_ratio` and
`skimage.metrics.structural_similarity(gaussian_weights=True)`
(reference utils/utils.py:79-83), leaving `data_range` to skimage's
inference. For float inputs that inference is a known parity trap
(SURVEY.md §5):

* PSNR: skimage uses `data_range = 1.0` when the reference image is
  non-negative (float dtype_range is (-1, 1) and `true_min >= 0` picks
  `dmax`), else 2.0.
* SSIM: skimage uses `data_range = dmax - dmin = 2.0` for floats,
  unconditionally (in the reference's pinned pre-0.19 environment).

We reproduce both defaults and expose `data_range` overrides.

SSIM details matched to skimage `structural_similarity(gaussian_weights=True)`:
gaussian window sigma=1.5, truncate=3.5 (-> 11x11 window), sample-covariance
normalization NP/(NP-1), scipy 'reflect' (= np.pad 'symmetric') boundary,
K1=0.01, K2=0.03, final mean over the image cropped by (win-1)//2.

Everything is pure jnp: under jit the gaussian filtering is two small
depthwise convolutions, so train/eval metrics run on-device with no host
round-trip (the reference instead stalls every train iteration on CPU
skimage, reference train.py:129).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def psnr(ref: jnp.ndarray, test: jnp.ndarray, data_range=None) -> jnp.ndarray:
    """Peak signal-to-noise ratio over the whole array (scalar).

    `data_range=None` reproduces skimage's float inference: 1.0 if
    ref.min() >= 0 else 2.0. Pass an explicit value to override.
    """
    ref = ref.astype(jnp.float32)
    test = test.astype(jnp.float32)
    if data_range is None:
        dr = jnp.where(jnp.min(ref) >= 0, 1.0, 2.0)
    else:
        dr = jnp.asarray(data_range, dtype=jnp.float32)
    mse = jnp.mean((ref - test) ** 2)
    return 10.0 * jnp.log10(dr * dr / mse)


@functools.lru_cache(maxsize=None)
def _gaussian_kernel1d(sigma: float = 1.5, truncate: float = 3.5) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d's kernel (order 0)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * x * x / (sigma * sigma))
    phi = phi / phi.sum()
    return phi.astype(np.float32)


def _gaussian_filter2d(img: jnp.ndarray, sigma: float = 1.5, truncate: float = 3.5) -> jnp.ndarray:
    """Separable gaussian filter over the trailing two dims of [..., H, W],
    scipy 'reflect' boundary (mirror including the edge sample)."""
    k = jnp.asarray(_gaussian_kernel1d(sigma, truncate))
    r = (k.shape[0] - 1) // 2
    *lead, H, W = img.shape
    x = img.reshape((-1, H, W))
    pad = [(0, 0), (r, r), (r, r)]
    x = jnp.pad(x, pad, mode="symmetric")
    # separable filtering: 1-D convs along rows then cols
    x = _conv1d_along(x, k, axis=1)
    x = _conv1d_along(x, k, axis=2)
    return x.reshape(*lead, H, W)


def _conv1d_along(x: jnp.ndarray, k: jnp.ndarray, axis: int) -> jnp.ndarray:
    """'valid' 1-D correlation of padded `x [N, H+2r, W+2r]` along `axis`.
    Gaussian kernel is symmetric so correlation == convolution."""
    x = jnp.moveaxis(x, axis, -1)
    # [N*other, L] -> conv via lax.conv_general_dilated with feature dim 1
    lead_shape = x.shape[:-1]
    L = x.shape[-1]
    xr = x.reshape((-1, 1, L))
    kr = k.reshape((1, 1, -1)).astype(x.dtype)
    # HIGHEST precision: SSIM's variance terms (uxx - ux^2) cancel almost
    # completely, so TPU default bf16-pass convs corrupt them (~0.03 SSIM
    # shift); exact-f32 filtering matches the CPU/skimage result.
    out = jax.lax.conv_general_dilated(
        xr, kr, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(lead_shape + (out.shape[-1],))
    return jnp.moveaxis(out, -1, axis)


def ssim(ref: jnp.ndarray, test: jnp.ndarray, data_range=None,
         sigma: float = 1.5, truncate: float = 3.5, K1: float = 0.01,
         K2: float = 0.03) -> jnp.ndarray:
    """Structural similarity of two [..., H, W] images (scalar per leading
    batch dims), matching skimage's gaussian_weights=True configuration.

    `data_range=None` reproduces the reference environment's float default
    of 2.0 (dtype_range spread) -- see module docstring.
    """
    ref = ref.astype(jnp.float32)
    test = test.astype(jnp.float32)
    if data_range is None:
        dr = 2.0
    else:
        dr = float(data_range)
    radius = int(truncate * sigma + 0.5)
    win = 2 * radius + 1
    NP = win * win
    cov_norm = NP / (NP - 1.0)

    ux = _gaussian_filter2d(ref, sigma, truncate)
    uy = _gaussian_filter2d(test, sigma, truncate)
    uxx = _gaussian_filter2d(ref * ref, sigma, truncate)
    uyy = _gaussian_filter2d(test * test, sigma, truncate)
    uxy = _gaussian_filter2d(ref * test, sigma, truncate)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    C1 = (K1 * dr) ** 2
    C2 = (K2 * dr) ** 2
    A1 = 2.0 * ux * uy + C1
    A2 = 2.0 * vxy + C2
    B1 = ux * ux + uy * uy + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    pad = (win - 1) // 2
    S = S[..., pad:-pad, pad:-pad]
    return jnp.mean(S, axis=(-2, -1))


def cal_loss_class(probability: jnp.ndarray) -> jnp.ndarray:
    """Cluster-probability spread loss; parity port of the reference's
    dead-code helper (reference utils/utils.py:197-210): for each row,
    (num_cluster - 1) minus the sum of |p_i - p_j| over all pairs,
    averaged over the batch. Vectorized instead of the reference's O(B*K^2)
    python loops."""
    probability = jnp.asarray(probability)
    assert probability.ndim == 2, "probability requires a 2-dim tensor"
    B, K = probability.shape
    diff = jnp.abs(probability[:, :, None] - probability[:, None, :])
    sum_re = jnp.sum(diff, axis=(1, 2)) / 2.0   # each unordered pair once
    return jnp.mean((K - 1) - sum_re)


def _view_stack(label, out, a: int):
    """-> per-view stacks [N, h, w], one pair per (batch, u, v), covering
    every input form the reference's cal_metrics accepts
    (reference utils/utils.py:56-78)."""
    if label.ndim == 2:                       # [A*h, A*w] mosaic (ref :57-59)
        label, out = label[None], out[None]
    if label.ndim == 4:                       # [B, C, H, W] (ref :61-65):
        # channel 0 of a batched mosaic. The reference views `label` with
        # H//A on BOTH spatial axes (its quirk at utils/utils.py:63) --
        # identical for the square inputs both pipelines use; enforce
        # squareness so the quirk can never silently diverge here.
        if label.shape[-2] != label.shape[-1]:
            raise ValueError(
                "4-D cal_metrics input must be square (the reference's "
                f"view() assumes H == W); got {label.shape}")
        label, out = label[:, 0], out[:, 0]
    if label.ndim == 5:                       # [C, U, V, h, w] (ref :67-70):
        # channel 0 of a per-view tensor; already view-separated
        lv, ov = label[0], out[0]
        U, V, h, w = lv.shape
        return lv.reshape(U * V, h, w), ov.reshape(U * V, h, w)
    B, H, W = label.shape                     # [B, A*h, A*w] mosaics
    h, w = H // a, W // a
    lv = label.reshape(B, a, h, a, w).transpose(0, 1, 3, 2, 4).reshape(B * a * a, h, w)
    ov = out.reshape(B, a, h, a, w).transpose(0, 1, 3, 2, 4).reshape(B * a * a, h, w)
    return lv, ov


def cal_metrics(label, out, ang_res: int, psnr_data_range=None,
                ssim_data_range=None):
    """Per-view PSNR/SSIM, averaged over views.

    Parity port of reference utils/utils.py:56-88. `label`/`out` may be a
    2-D `[A*h, A*w]` mosaic, batched `[B, A*h, A*w]` mosaics, a 4-D
    `[B, C, H, W]` batch (channel 0 used, like the reference), or a 5-D
    `[C, U, V, h, w]` per-view tensor. Metrics are computed per view (u, v)
    and averaged with the reference's positive-mask mean
    (`sum / count(x > 0)`, reference utils/utils.py:85-86).

    Returns (psnr_mean, ssim_mean) as jnp scalars. Jit-compatible.
    """
    label = jnp.asarray(label)
    out = jnp.asarray(out)
    lv, ov = _view_stack(label, out, ang_res)

    p = jax.vmap(lambda r, t: psnr(r, t, psnr_data_range))(lv, ov)
    s = ssim(lv, ov, ssim_data_range)
    psnr_mean = jnp.sum(p) / jnp.maximum(jnp.sum(p > 0), 1)
    ssim_mean = jnp.sum(s) / jnp.maximum(jnp.sum(s > 0), 1)
    return psnr_mean, ssim_mean
