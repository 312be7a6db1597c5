"""Golden-parity tests for LFdivide / ImageExtend / LFintegrate
(reference utils/utils.py:91-157)."""

import numpy as np
import jax.numpy as jnp

from lft_tpu.ops import tiling


def test_image_extend(goldens):
    g = goldens("tiling.npz")
    ours = tiling.image_extend(jnp.asarray(g["ext_im"]), 3)
    np.testing.assert_array_equal(np.asarray(ours), g["ext_out"])


def test_lf_divide(goldens):
    g = goldens("tiling.npz")
    a, h0, w0, patch, stride = g["div_meta"]
    ours = tiling.lf_divide(jnp.asarray(g["div_mosaic"]), int(a), int(patch), int(stride))
    np.testing.assert_allclose(np.asarray(ours), g["div_out"], atol=0)


def test_lf_integrate(goldens):
    g = goldens("tiling.npz")
    a, h0, w0, patch, stride = g["div_meta"]
    ours = tiling.lf_integrate(jnp.asarray(g["div_out"]), int(a), int(patch),
                               int(stride), int(h0), int(w0))
    np.testing.assert_allclose(np.asarray(ours), g["int_out"], atol=0)


def test_divide_integrate_roundtrip():
    """Dividing then integrating (scale 1) must reproduce the scene exactly."""
    rng = np.random.RandomState(0)
    a, h0, w0, patch, stride = 5, 33, 29, 16, 8
    mosaic = rng.rand(a * h0, a * w0).astype(np.float32)
    sub = tiling.lf_divide(jnp.asarray(mosaic), a, patch, stride)
    out = tiling.lf_integrate(sub, a, patch, stride, h0, w0)
    views = mosaic.reshape(a, h0, a, w0).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), views, atol=0)


def test_views_4d_to_mosaic():
    rng = np.random.RandomState(1)
    v = rng.rand(5, 5, 3, 4).astype(np.float32)
    m = tiling.views_4d_to_mosaic(jnp.asarray(v))
    assert m.shape == (15, 20)
    np.testing.assert_array_equal(np.asarray(m)[3 * 2:3 * 3, 4 * 4:4 * 5], v[2, 4])


def test_divide_integrate_roundtrip_many_geometries():
    """Property sweep: the divide->integrate identity must hold for every
    (angRes, h0, w0, patch, stride) geometry the eval pipeline can see,
    including non-dividing sizes, tiny scenes, and stride == patch/2 vs
    other even splits (reference utils/utils.py:91-157 semantics)."""
    rng = np.random.RandomState(3)
    cases = [
        (5, 32, 32, 32, 16), (5, 17, 23, 8, 4), (3, 40, 28, 16, 8),
        (5, 9, 9, 8, 4), (2, 64, 48, 32, 16), (5, 50, 34, 20, 10),
        (7, 21, 15, 12, 6), (5, 31, 47, 16, 8),
    ]
    for a, h0, w0, patch, stride in cases:
        mosaic = rng.rand(a * h0, a * w0).astype(np.float32)
        sub = tiling.lf_divide(jnp.asarray(mosaic), a, patch, stride)
        out = tiling.lf_integrate(sub, a, patch, stride, h0, w0)
        views = mosaic.reshape(a, h0, a, w0).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(
            np.asarray(out), views, atol=0,
            err_msg=f"roundtrip failed at {(a, h0, w0, patch, stride)}")
