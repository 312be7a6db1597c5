"""PSNR/SSIM tests: cross-checked against an independent scipy-based
implementation of skimage's algorithm (skimage itself is not available in
this environment; the independent check mirrors
skimage.metrics.structural_similarity(gaussian_weights=True) /
peak_signal_noise_ratio semantics the reference relies on,
reference utils/utils.py:79-83)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.ndimage import gaussian_filter

from lft_tpu.ops import metrics


def _psnr_ref(ref, test, data_range):
    mse = np.mean((ref.astype(np.float64) - test.astype(np.float64)) ** 2)
    return 10.0 * np.log10(data_range ** 2 / mse)


def _ssim_ref(im1, im2, data_range=2.0, sigma=1.5, truncate=3.5):
    """Independent port of skimage structural_similarity with
    gaussian_weights=True, use_sample_covariance=True."""
    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    r = int(truncate * sigma + 0.5)
    win = 2 * r + 1
    NP = win ** 2
    cov_norm = NP / (NP - 1)
    f = lambda x: gaussian_filter(x, sigma=sigma, truncate=truncate, mode="reflect")
    ux, uy = f(im1), f(im2)
    uxx, uyy, uxy = f(im1 * im1), f(im2 * im2), f(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    pad = (win - 1) // 2
    return S[pad:-pad, pad:-pad].mean()


def test_psnr_matches_formula():
    rng = np.random.RandomState(0)
    a = rng.rand(32, 32).astype(np.float32)
    b = np.clip(a + 0.05 * rng.randn(32, 32).astype(np.float32), 0, 1)
    ours = float(metrics.psnr(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ours - _psnr_ref(a, b, 1.0)) < 1e-4


def test_psnr_data_range_inference_negative():
    """skimage default: data_range 2.0 when the reference image has
    negatives (float dtype_range spread)."""
    rng = np.random.RandomState(1)
    a = (rng.rand(16, 16) - 0.5).astype(np.float32)
    b = a + 0.01
    ours = float(metrics.psnr(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ours - _psnr_ref(a, b, 2.0)) < 1e-4


@pytest.mark.parametrize("shape", [(32, 32), (40, 28)])
def test_ssim_matches_independent_impl(shape):
    rng = np.random.RandomState(2)
    a = rng.rand(*shape).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(*shape).astype(np.float32), 0, 1)
    ours = float(metrics.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _ssim_ref(a, b, data_range=2.0)
    assert abs(ours - ref) < 1e-5, (ours, ref)


def test_ssim_identical_images():
    rng = np.random.RandomState(3)
    a = rng.rand(24, 24).astype(np.float32)
    assert float(metrics.ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-6)


def test_cal_metrics_mosaic():
    """Per-view averaging semantics (reference utils/utils.py:56-88)."""
    rng = np.random.RandomState(4)
    a_res, h, w = 5, 16, 16
    label = rng.rand(a_res * h, a_res * w).astype(np.float32)
    out = np.clip(label + 0.05 * rng.randn(*label.shape).astype(np.float32), 0, 1)
    p, s = metrics.cal_metrics(label, out, a_res)
    # manual per-view
    lv = label.reshape(a_res, h, a_res, w).transpose(0, 2, 1, 3)
    ov = out.reshape(a_res, h, a_res, w).transpose(0, 2, 1, 3)
    ps, ss = [], []
    for u in range(a_res):
        for v in range(a_res):
            ps.append(_psnr_ref(lv[u, v], ov[u, v], 1.0))
            ss.append(_ssim_ref(lv[u, v], ov[u, v], 2.0))
    assert abs(float(p) - np.mean(ps)) < 1e-3
    assert abs(float(s) - np.mean(ss)) < 1e-5


def test_cal_metrics_4d_and_5d_inputs():
    """The reference's 4-D [B, C, H, W] and 5-D [C, U, V, h, w] input
    branches (reference utils/utils.py:61-70) must agree with the 2-D
    mosaic path on the same data (channel 0 only, like the reference)."""
    rng = np.random.RandomState(5)
    a_res, h, w = 3, 16, 16
    label = rng.rand(a_res * h, a_res * w).astype(np.float32)
    out = np.clip(label + 0.05 * rng.randn(*label.shape).astype(np.float32), 0, 1)
    p2, s2 = metrics.cal_metrics(label, out, a_res)

    # 4-D: batched mosaic with a channel axis; extra channels are ignored
    l4 = np.stack([label, rng.rand(*label.shape).astype(np.float32)])[None]
    o4 = np.stack([out, rng.rand(*label.shape).astype(np.float32)])[None]
    p4, s4 = metrics.cal_metrics(l4, o4, a_res)
    assert abs(float(p4) - float(p2)) < 1e-5
    assert abs(float(s4) - float(s2)) < 1e-6

    # 5-D: [C, U, V, h, w] per-view tensor
    lv = label.reshape(a_res, h, a_res, w).transpose(0, 2, 1, 3)
    ov = out.reshape(a_res, h, a_res, w).transpose(0, 2, 1, 3)
    p5, s5 = metrics.cal_metrics(lv[None], ov[None], a_res)
    assert abs(float(p5) - float(p2)) < 1e-5
    assert abs(float(s5) - float(s2)) < 1e-6

    # 4-D rectangular input hits the reference's square-only view() quirk
    with pytest.raises(ValueError, match="square"):
        metrics.cal_metrics(l4[..., :-a_res], o4[..., :-a_res], a_res)
