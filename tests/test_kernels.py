"""Pallas kernel A/B parity tests (interpret mode on the CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lft_tpu.ops import attention as A


def _rand(shape, seed, scale=1.0):
    return jnp.asarray((np.random.RandomState(seed).rand(*shape) - 0.5)
                       .astype(np.float32) * scale)


@pytest.mark.parametrize("hw", [(16, 16), (32, 32)])
def test_pallas_local_attention_matches_tiled(hw):
    from lft_tpu.kernels.local_attn import local_attention_pallas
    h, w = hw
    B, E, H = 2, 128, 8
    qn = _rand((B, h, w, E), 0)
    v = _rand((B, h, w, E), 1)
    wi = _rand((3 * E, E), 2, 0.2)
    wo = _rand((E, E), 3, 0.2)
    ref = A.local_attention(qn, v, wi, wo, H, k=5, impl="tiled")
    out = local_attention_pallas(qn, v, wi, wo, H, k=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_pallas_dispatcher():
    """attention_impl='pallas' must route through the kernel and agree with
    dense."""
    B, h, w, E, H = 1, 16, 16, 64, 8
    qn = _rand((B, h, w, E), 4)
    v = _rand((B, h, w, E), 5)
    wi = _rand((3 * E, E), 6, 0.2)
    wo = _rand((E, E), 7, 0.2)
    dense = A.local_attention(qn, v, wi, wo, H, k=5, impl="dense")
    pallas = A.local_attention(qn, v, wi, wo, H, k=5, impl="pallas")
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(dense),
                               atol=2e-5, rtol=1e-4)


def test_pallas_ang_attention_matches_mha():
    from lft_tpu.kernels.ang_attn import ang_attention_pallas
    B, T, C, H = 3, 25, 64, 8
    qn = _rand((B, 40, T, C), 8)
    v = _rand((B, 40, T, C), 9)
    wi = _rand((3 * C, C), 10, 0.2)
    wo = _rand((C, C), 11, 0.2)
    ref = A.multi_head_attention(qn, qn, v, wi, wo, H)
    out = ang_attention_pallas(qn, v, wi, wo, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_model_forward_pallas_matches_tiled_cpu():
    """Full model: pallas impl (interpret on CPU) must equal tiled."""
    import jax
    from lft_tpu.config import Args
    from lft_tpu.models import lft
    args = Args(angRes=5, scale_factor=2, channels=16)
    p = lft.init_params(jax.random.PRNGKey(0), args)
    x = _rand((1, 1, 5 * 16, 5 * 16), 12) + 0.5
    a = lft.forward(p, x, args, attention_impl="tiled")
    b = lft.forward(p, x, args, attention_impl="pallas")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)


def test_pallas_local_attention_grad_matches_xla():
    """Custom VJP vs XLA autodiff through the tiled path (banded case)."""
    import jax
    from lft_tpu.kernels.local_attn_vjp import local_attention_pallas_ad
    B, h, w, E, H = 1, 32, 32, 128, 8   # 32x32 -> row-banded backward
    qn = _rand((B, h, w, E), 20)
    v = _rand((B, h, w, E), 21)
    wi = _rand((3 * E, E), 22, 0.1)
    wo = _rand((E, E), 23, 0.1)
    f_ref = lambda *a: jnp.sum(jnp.sin(A.local_attention(*a, H, k=5, impl="tiled")))
    f_ker = lambda *a: jnp.sum(jnp.sin(local_attention_pallas_ad(*a, H, k=5)))
    g1 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(qn, v, wi, wo)
    g2 = jax.grad(f_ker, argnums=(0, 1, 2, 3))(qn, v, wi, wo)
    for name, a, b in zip(["dqn", "dv", "dwi", "dwo"], g1, g2):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5, name


def test_pallas_ang_attention_grad_matches_xla():
    import jax
    from lft_tpu.kernels.ang_attn_vjp import ang_attention_pallas_ad
    B, P, T, C, H = 2, 40, 25, 64, 8
    qn = _rand((B, P, T, C), 24)
    v = _rand((B, P, T, C), 25)
    wi = _rand((3 * C, C), 26, 0.1)
    wo = _rand((C, C), 27, 0.1)
    f_ref = lambda *a: jnp.sum(jnp.sin(A.multi_head_attention(a[0], a[0], a[1], a[2], a[3], H)))
    f_ker = lambda *a: jnp.sum(jnp.sin(ang_attention_pallas_ad(*a, H)))
    g1 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(qn, v, wi, wo)
    g2 = jax.grad(f_ker, argnums=(0, 1, 2, 3))(qn, v, wi, wo)
    for name, a, b in zip(["dqn", "dv", "dwi", "dwo"], g1, g2):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5, name


def test_spa_mxu_forward_matches_tiled():
    """Tile-dense MXU kernel (kernels/spa_attn.py) vs the XLA tiled path."""
    from lft_tpu.kernels.spa_attn import local_attention_tile_mxu
    B, h, w, E, H = 2, 32, 32, 128, 8
    qn = _rand((B, h, w, E), 30)
    v = _rand((B, h, w, E), 31)
    wi = _rand((3 * E, E), 32, 0.2)
    wo = _rand((E, E), 33, 0.2)
    ref = A.local_attention(qn, v, wi, wo, H, k=5, impl="tiled")
    out = local_attention_tile_mxu(qn, v, wi, wo, H, k=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_spa_mxu_grad_matches_xla():
    """Custom VJP of the tile-dense MXU spatial kernel vs XLA autodiff."""
    from lft_tpu.kernels.spa_attn import local_attention_tile_mxu
    B, h, w, E, H = 1, 16, 16, 64, 8
    qn = _rand((B, h, w, E), 34)
    v = _rand((B, h, w, E), 35)
    wi = _rand((3 * E, E), 36, 0.1)
    wo = _rand((E, E), 37, 0.1)
    f_ref = lambda *a: jnp.sum(jnp.sin(A.local_attention(*a, H, k=5, impl="tiled")))
    f_ker = lambda *a: jnp.sum(jnp.sin(local_attention_tile_mxu(*a, H, k=5)))
    g1 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(qn, v, wi, wo)
    g2 = jax.grad(f_ker, argnums=(0, 1, 2, 3))(qn, v, wi, wo)
    for name, a, b in zip(["dqn", "dv", "dwi", "dwo"], g1, g2):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5, name


def test_spa_hybrid_forward_and_grad():
    """Hybrid custom-VJP (offset primal / MXU fwd+bwd): value must match the
    XLA tiled path and gradients must match XLA autodiff."""
    from lft_tpu.kernels.spa_attn import (
        local_attention_tile_mxu, windowed_attention_hybrid)
    B, h, w, E, H = 1, 16, 16, 64, 8
    qn = _rand((B, h, w, E), 50)
    v = _rand((B, h, w, E), 51)
    wi = _rand((3 * E, E), 52, 0.1)
    wo = _rand((E, E), 53, 0.1)
    hyb = lambda *a: local_attention_tile_mxu(
        *a, H, k=5, attention=windowed_attention_hybrid)
    ref = A.local_attention(qn, v, wi, wo, H, k=5, impl="tiled")
    np.testing.assert_allclose(np.asarray(hyb(qn, v, wi, wo)),
                               np.asarray(ref), atol=2e-5, rtol=1e-4)
    f_ref = lambda *a: jnp.sum(jnp.sin(A.local_attention(*a, H, k=5, impl="tiled")))
    f_ker = lambda *a: jnp.sum(jnp.sin(hyb(*a)))
    g1 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(qn, v, wi, wo)
    g2 = jax.grad(f_ker, argnums=(0, 1, 2, 3))(qn, v, wi, wo)
    for name, a, b in zip(["dqn", "dv", "dwi", "dwo"], g1, g2):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5, name


@pytest.mark.slow
def test_spa_headpacked_grad_production_shape():
    """Head-packed fwd/bwd (spa_attn_hp.py) at the production geometry
    (32x32 tokens, E=128): value and grads vs the XLA tiled path."""
    from lft_tpu.kernels.spa_attn import (
        local_attention_tile_mxu, windowed_attention_hybrid)
    B, h, w, E, H = 1, 32, 32, 128, 8
    qn = _rand((B, h, w, E), 60)
    v = _rand((B, h, w, E), 61)
    wi = _rand((3 * E, E), 62, 0.1)
    wo = _rand((E, E), 63, 0.1)
    hyb = lambda *a: local_attention_tile_mxu(
        *a, H, k=5, attention=windowed_attention_hybrid)
    f_ref = lambda *a: jnp.sum(jnp.sin(A.local_attention(*a, H, k=5, impl="tiled")))
    f_ker = lambda *a: jnp.sum(jnp.sin(hyb(*a)))
    g1 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(qn, v, wi, wo)
    g2 = jax.grad(f_ker, argnums=(0, 1, 2, 3))(qn, v, wi, wo)
    for name, a, b in zip(["dqn", "dv", "dwi", "dwo"], g1, g2):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5, name


def test_ang_mxu_forward_odd_rows():
    """Block-diag MXU angular kernel, odd pixel count (pair-packing off) and
    non-multiple-of-G row padding."""
    from lft_tpu.kernels.ang_attn_mxu import ang_attention_mxu
    B, P, T, C, H = 1, 37, 25, 64, 8   # N = 37 rows: odd, not % G
    qn = _rand((B, P, T, C), 38)
    v = _rand((B, P, T, C), 39)
    wi = _rand((3 * C, C), 40, 0.2)
    wo = _rand((C, C), 41, 0.2)
    ref = A.multi_head_attention(qn, qn, v, wi, wo, H)
    out = ang_attention_mxu(qn, v, wi, wo, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ang_dispatch_large_a2_falls_back():
    """angRes >= 12 gives A2 > 128, beyond the block-diag MXU packing; the
    default dispatcher must fall back to the key-sweep kernel (which
    supports any A2) instead of crashing."""
    from lft_tpu.kernels.ang_attn import ang_attention_pallas
    B, P, T, C, H = 1, 4, 169, 32, 8   # A2 = 13^2
    qn = _rand((B, P, T, C), 70)
    v = _rand((B, P, T, C), 71)
    wi = _rand((3 * C, C), 72, 0.2)
    wo = _rand((C, C), 73, 0.2)
    ref = A.multi_head_attention(qn, qn, v, wi, wo, H)
    out = ang_attention_pallas(qn, v, wi, wo, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ang_mxu_grad_matches_xla():
    """Custom VJP of the block-diag MXU angular kernel (pair-packed path)."""
    from lft_tpu.kernels.ang_attn_mxu import ang_attention_mxu
    B, P, T, C, H = 2, 20, 25, 64, 8
    qn = _rand((B, P, T, C), 42)
    v = _rand((B, P, T, C), 43)
    wi = _rand((3 * C, C), 44, 0.1)
    wo = _rand((C, C), 45, 0.1)
    f_ref = lambda *a: jnp.sum(jnp.sin(A.multi_head_attention(a[0], a[0], a[1], a[2], a[3], H)))
    f_ker = lambda *a: jnp.sum(jnp.sin(ang_attention_mxu(*a, H)))
    g1 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(qn, v, wi, wo)
    g2 = jax.grad(f_ker, argnums=(0, 1, 2, 3))(qn, v, wi, wo)
    for name, a, b in zip(["dqn", "dv", "dwi", "dwo"], g1, g2):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5, name


def test_pallas_tile_halo_variant_matches_tiled():
    """The tile-halo Pallas kernel (variant='tile', the large-patch
    fallback for h*w > the offset kernel's VMEM gate) vs the XLA tiled
    path -- direct coverage, since the default dispatch no longer routes
    through it at test geometries."""
    from lft_tpu.kernels.local_attn import local_attention_pallas
    B, h, w, E, H = 2, 16, 16, 128, 8
    qn = _rand((B, h, w, E), 80)
    v = _rand((B, h, w, E), 81)
    wi = _rand((3 * E, E), 82, 0.2)
    wo = _rand((E, E), 83, 0.2)
    ref = A.local_attention(qn, v, wi, wo, H, k=5, impl="tiled")
    out = local_attention_pallas(qn, v, wi, wo, H, k=5, variant="tile")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_unknown_variant_raises():
    """A typo'd LFT_SPA_VARIANT/LFT_ANG_VARIANT must error, not silently
    fall through to the slowest path."""
    import os
    from lft_tpu.kernels.local_attn import local_attention_pallas
    from lft_tpu.kernels.ang_attn import ang_attention_pallas
    B, h, w, E, H = 1, 16, 16, 64, 8
    qn = _rand((B, h, w, E), 90)
    v = _rand((B, h, w, E), 91)
    wi = _rand((3 * E, E), 92, 0.2)
    wo = _rand((E, E), 93, 0.2)
    with pytest.raises(ValueError, match="unknown spatial attention"):
        local_attention_pallas(qn, v, wi, wo, H, k=5, variant="mxuu")
    os.environ["LFT_ANG_VARIANT"] = "sweeep"
    try:
        with pytest.raises(ValueError, match="unknown angular attention"):
            ang_attention_pallas(_rand((1, 16, 25, 64), 94),
                                 _rand((1, 16, 25, 64), 95),
                                 _rand((192, 64), 96, 0.2),
                                 _rand((64, 64), 97, 0.2), 8)
    finally:
        del os.environ["LFT_ANG_VARIANT"]


def test_spa_mxu_untileable_geometry_raises():
    """Calling the tile-dense MXU kernel on an untileable (h, w) must give
    an explicit error, not an opaque NoneType unpack failure."""
    from lft_tpu.kernels.spa_attn import local_attention_tile_mxu
    B, h, w, E, H = 1, 7, 11, 64, 8
    qn = _rand((B, h, w, E), 98)
    v = _rand((B, h, w, E), 99)
    wi = _rand((3 * E, E), 100, 0.2)
    wo = _rand((E, E), 101, 0.2)
    with pytest.raises(ValueError, match="no valid query tile"):
        local_attention_tile_mxu(qn, v, wi, wo, H, k=5)


@pytest.mark.slow
def test_model_grad_pallas_matches_tiled():
    """End-to-end model gradients: pallas impl vs XLA tiled impl."""
    import jax
    from lft_tpu.config import Args
    from lft_tpu.models import lft
    args = Args(angRes=5, scale_factor=2, channels=16)
    p = lft.init_params(jax.random.PRNGKey(0), args)
    x = _rand((1, 1, 5 * 16, 5 * 16), 28) + 0.5
    y = _rand((1, 1, 5 * 32, 5 * 32), 29) + 0.5

    def loss(p, impl):
        return lft.l1_loss(lft.forward(p, x, args, attention_impl=impl), y)

    g1 = jax.grad(lambda p: loss(p, "tiled"))(p)
    g2 = jax.grad(lambda p: loss(p, "pallas"))(p)
    for k in g1:
        scale = float(jnp.max(jnp.abs(g1[k]))) + 1e-9
        diff = float(jnp.max(jnp.abs(g1[k] - g2[k])))
        assert diff / scale < 5e-4, (k, diff, scale)


def test_spa_block_fused_matches_unfused():
    """The fused whole-SpaTrans-block kernel (kernels/spa_block.py) vs the
    unfused XLA path on identical inputs/params."""
    import lft_tpu.models.lft as lft_mod
    from lft_tpu.config import Args
    from lft_tpu.ops.posenc import spatial_position
    args = Args(angRes=5, scale_factor=2, channels=64, model_name="LFT")
    params = lft_mod.init_params(jax.random.PRNGKey(0), args)
    C, h, w, B = 64, 16, 16, 3   # B=3 exercises the view-pad drop
    prefix = "altblock.1.spa_trans."
    x = _rand((1, B, h, w, C), 60)
    spa_pe = jnp.asarray(spatial_position(h, w, C))
    ref = lft_mod._spa_trans(x, params, prefix, spa_pe, "tiled")
    got = lft_mod._spa_trans(x, params, prefix, spa_pe, "tiled", fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_forward_fused_matches_unfused():
    """forward(fused=True) -- the tiled-inference configuration on real
    TPUs -- must equal the plain forward."""
    import lft_tpu.models.lft as lft_mod
    from lft_tpu.config import Args
    args = Args(angRes=5, scale_factor=2, channels=64, model_name="LFT")
    params = lft_mod.init_params(jax.random.PRNGKey(1), args)
    lr = _rand((1, 1, 5 * 16, 5 * 16), 61) + 0.5
    ref = lft_mod.forward(params, lr, args, remat=False)
    got = lft_mod.forward(params, lr, args, remat=False, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ang_block_fused_matches_unfused():
    """The fused whole-AngTrans-block kernel (kernels/ang_block.py) vs the
    unfused XLA path on identical inputs/params."""
    import lft_tpu.models.lft as lft_mod
    from lft_tpu.config import Args
    from lft_tpu.kernels.ang_block import ang_trans_block_fused
    from lft_tpu.ops.posenc import angular_position
    args = Args(angRes=5, scale_factor=2, channels=64, model_name="LFT")
    params = lft_mod.init_params(jax.random.PRNGKey(2), args)
    C, h, w, B, A2 = 64, 8, 8, 2, 25
    prefix = "altblock.2.ang_trans."
    x = _rand((B, A2, h, w, C), 70)
    ang_pe = jnp.asarray(angular_position(A2, C))
    ref = lft_mod._ang_trans(x, params, prefix, ang_pe, impl="xla")
    toks = x.transpose(0, 2, 3, 1, 4).reshape(B * h * w, A2, C)
    got = ang_trans_block_fused(toks, ang_pe, params, prefix, 8)
    got = got.reshape(B, h, w, A2, C).transpose(0, 3, 1, 2, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_spa_block_fused_grad_matches_unfused():
    """Gradients THROUGH the fused whole-SpaTrans-block kernel (its custom
    recompute+backward VJP, kernels/spa_block.py) vs XLA autodiff of the
    unfused path -- every weight (incl. MLP.weight via the pe_tok
    cotangent, reference model/LFT.py:180) and the block input."""
    import lft_tpu.models.lft as lft_mod
    from lft_tpu.config import Args
    from lft_tpu.ops.posenc import spatial_position
    args = Args(angRes=5, scale_factor=2, channels=64, model_name="LFT")
    params = lft_mod.init_params(jax.random.PRNGKey(0), args)
    C, h, w, B = 64, 16, 16, 3
    prefix = "altblock.1.spa_trans."
    x = _rand((1, B, h, w, C), 60)
    spa_pe = jnp.asarray(spatial_position(h, w, C))
    sub = {k: params[k] for k in params if k.startswith(prefix)}

    def loss(sub, x_, fused):
        p = dict(params)
        p.update(sub)
        out = lft_mod._spa_trans(x_, p, prefix, spa_pe, "tiled", fused=fused)
        return jnp.sum(out * jnp.cos(out))

    (g1, gx1) = jax.grad(loss, argnums=(0, 1))(sub, x, False)
    (g2, gx2) = jax.grad(loss, argnums=(0, 1))(sub, x, True)
    for k in g1:
        scale = float(jnp.max(jnp.abs(g1[k]))) + 1e-9
        assert float(jnp.max(jnp.abs(g1[k] - g2[k]))) / scale < 5e-4, k
    scale = float(jnp.max(jnp.abs(gx1))) + 1e-9
    assert float(jnp.max(jnp.abs(gx1 - gx2))) / scale < 5e-4


def test_ang_block_fused_grad_matches_unfused():
    """Gradients THROUGH the fused whole-AngTrans-block kernel (its custom
    recompute+backward VJP, kernels/ang_block.py) vs XLA autodiff of the
    unfused path. B*h*w = 128 is NOT a multiple of the backward's G*GPS,
    so the zero-padded-tail accumulator path is exercised."""
    import lft_tpu.models.lft as lft_mod
    from lft_tpu.config import Args
    from lft_tpu.kernels.ang_block import ang_trans_block_fused
    from lft_tpu.ops.posenc import angular_position
    args = Args(angRes=5, scale_factor=2, channels=64, model_name="LFT")
    params = lft_mod.init_params(jax.random.PRNGKey(2), args)
    C, h, w, B, A2 = 64, 8, 8, 2, 25
    prefix = "altblock.2.ang_trans."
    x = _rand((B, A2, h, w, C), 70)
    ang_pe = jnp.asarray(angular_position(A2, C))
    sub = {k: params[k] for k in params if k.startswith(prefix)}

    def loss_ref(sub, x_):
        p = dict(params)
        p.update(sub)
        out = lft_mod._ang_trans(x_, p, prefix, ang_pe, impl="xla")
        return jnp.sum(out * jnp.cos(out))

    def loss_fused(sub, x_):
        p = dict(params)
        p.update(sub)
        toks = x_.transpose(0, 2, 3, 1, 4).reshape(B * h * w, A2, C)
        out = ang_trans_block_fused(toks, ang_pe, p, prefix, 8)
        out = out.reshape(B, h, w, A2, C).transpose(0, 3, 1, 2, 4)
        return jnp.sum(out * jnp.cos(out))

    (g1, gx1) = jax.grad(loss_ref, argnums=(0, 1))(sub, x)
    (g2, gx2) = jax.grad(loss_fused, argnums=(0, 1))(sub, x)
    for k in g1:
        scale = float(jnp.max(jnp.abs(g1[k]))) + 1e-9
        assert float(jnp.max(jnp.abs(g1[k] - g2[k]))) / scale < 5e-4, k
    scale = float(jnp.max(jnp.abs(gx1))) + 1e-9
    assert float(jnp.max(jnp.abs(gx1 - gx2))) / scale < 5e-4


@pytest.mark.slow
def test_model_grad_fused_blocks_production_geometry():
    """End-to-end model gradients through forward(fused=True) -- the bf16
    TPU train configuration's graph, at the production 32x32 patch
    geometry -- vs the unfused XLA tiled path (f32 on CPU interpret)."""
    import jax
    from lft_tpu.config import Args
    from lft_tpu.models import lft
    args = Args(angRes=5, scale_factor=2, channels=64)
    p = lft.init_params(jax.random.PRNGKey(0), args)
    x = _rand((1, 1, 5 * 32, 5 * 32), 28) + 0.5
    y = _rand((1, 1, 5 * 64, 5 * 64), 29) + 0.5

    def loss(p, fused):
        # smooth loss, not L1: d|.|/dx = sign() flips on f32-rounding-level
        # forward differences between the two paths, which would dominate
        # the comparison with noise unrelated to the VJPs under test
        sr = lft.forward(p, x, args, attention_impl="tiled", remat=False,
                         fused=fused)
        return jnp.mean((sr - y) * jnp.cos(3.0 * (sr - y)))

    g1 = jax.grad(lambda p: loss(p, False))(p)
    g2 = jax.grad(lambda p: loss(p, True))(p)
    for k in g1:
        scale = float(jnp.max(jnp.abs(g1[k]))) + 1e-9
        diff = float(jnp.max(jnp.abs(g1[k] - g2[k])))
        # absolute floor: deep LN-affine grads through 4 blocks are ~1e-6
        # -- a pure relative bound amplifies f32 rounding noise
        assert diff < 5e-4 * scale + 2e-9, (k, diff, scale)


def test_spa_block_fused_mixed_close_to_f32():
    """Mixed mode (mm_half=True: f32 IO/residuals, bf16 matmul operands --
    the `--dtype mixed` shipping config) must track the exact-f32 unfused
    path to bf16-matmul noise, i.e. ~100x tighter than an all-bf16 block
    (where IO/residual casts dominate, PARITY_bf16.json r4)."""
    import lft_tpu.models.lft as lft_mod
    from lft_tpu.config import Args
    from lft_tpu.ops.posenc import spatial_position
    args = Args(angRes=5, scale_factor=2, channels=64, model_name="LFT")
    params = lft_mod.init_params(jax.random.PRNGKey(0), args)
    C, h, w, B = 64, 16, 16, 3
    prefix = "altblock.1.spa_trans."
    x = _rand((1, B, h, w, C), 60)
    spa_pe = jnp.asarray(spatial_position(h, w, C))
    ref = lft_mod._spa_trans(x, params, prefix, spa_pe, "tiled")
    got = lft_mod._spa_trans(x, params, prefix, spa_pe, "tiled",
                             fused=True, mm_half=True)
    assert got.dtype == ref.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    assert err < 2e-2, err


def test_ang_block_fused_mixed_close_to_f32():
    import lft_tpu.models.lft as lft_mod
    from lft_tpu.config import Args
    from lft_tpu.kernels.ang_block import ang_trans_block_fused
    from lft_tpu.ops.posenc import angular_position
    args = Args(angRes=5, scale_factor=2, channels=64, model_name="LFT")
    params = lft_mod.init_params(jax.random.PRNGKey(2), args)
    C, h, w, B, A2 = 64, 8, 8, 2, 25
    prefix = "altblock.2.ang_trans."
    x = _rand((B, A2, h, w, C), 70)
    ang_pe = jnp.asarray(angular_position(A2, C))
    ref = lft_mod._ang_trans(x, params, prefix, ang_pe, impl="xla")
    toks = x.transpose(0, 2, 3, 1, 4).reshape(B * h * w, A2, C)
    got = ang_trans_block_fused(toks, ang_pe, params, prefix, 8,
                                mm_half=True)
    got = got.reshape(B, h, w, A2, C).transpose(0, 3, 1, 2, 4)
    assert got.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    assert err < 2e-2, err


def test_fused_mixed_grads_finite_and_close():
    """Gradients through BOTH fused blocks in mixed mode: finite (the pad
    rows' m=1e9 guard, ADVICE r4 item 3) and within bf16-matmul noise of
    the f32 unfused autodiff."""
    import lft_tpu.models.lft as lft_mod
    from lft_tpu.config import Args
    from lft_tpu.kernels.ang_block import ang_trans_block_fused
    from lft_tpu.ops.posenc import spatial_position
    args = Args(angRes=5, scale_factor=2, channels=64, model_name="LFT")
    params = lft_mod.init_params(jax.random.PRNGKey(0), args)
    C, h, w, B = 64, 16, 16, 3   # B=3 exercises the view-pad drop
    prefix = "altblock.1.spa_trans."
    x = _rand((1, B, h, w, C), 60)
    spa_pe = jnp.asarray(spatial_position(h, w, C))
    sub = {k: params[k] for k in params if k.startswith(prefix)}

    def loss(sub, x_, fused, mm):
        p = dict(params)
        p.update(sub)
        out = lft_mod._spa_trans(x_, p, prefix, spa_pe, "tiled",
                                 fused=fused, mm_half=mm)
        return jnp.sum(out * jnp.cos(out))

    (g1, gx1) = jax.grad(loss, argnums=(0, 1))(sub, x, False, False)
    (g2, gx2) = jax.grad(loss, argnums=(0, 1))(sub, x, True, True)

    def rel2(a, b):
        return float(jnp.linalg.norm((a - b).ravel())
                     / (jnp.linalg.norm(a.ravel()) + 1e-9))

    # L2-relative, not worst-element: bf16-operand rounding in the grad
    # accumulations measures 0.2-2.7% in L2 (training-irrelevant next to
    # batch noise) while the heavy-tailed per-element max hits ~8% on
    # elements far below the grad's scale. The OUTPUT parity above is 2e-2.
    for k in g1:
        assert bool(jnp.all(jnp.isfinite(g2[k]))), k
        assert rel2(g1[k], g2[k]) < 5e-2, k
    assert bool(jnp.all(jnp.isfinite(gx2)))
    assert rel2(gx1, gx2) < 5e-2


def test_fused_falls_back_on_nonqualifying_geometry():
    """forward(fused=True) on a geometry the fused blocks DON'T support
    (angRes 13: A^2 = 169 > the angular kernel's 128-row block) must
    silently take the unfused path and still match forward(fused=False)
    exactly -- and train (finite grads through the remat'd fallback).
    The envelope itself is wide (kernels/README.md): the gates are
    A^2 <= 128, spa_dim % heads == 0, and pick_hp_geometry's tile
    limits (nq <= 128, n_tiles <= 64, H*KB <= 4096)."""
    import jax
    from lft_tpu.config import Args
    from lft_tpu.kernels.spa_block import spa_block_applicable
    from lft_tpu.kernels.ang_block import ang_block_applicable
    from lft_tpu.models import lft
    assert spa_block_applicable(8, 8, 16, 8, 5)
    assert not spa_block_applicable(16, 16, 20, 8, 5)   # D % heads != 0
    assert ang_block_applicable(25)
    assert not ang_block_applicable(169)                # angRes 13
    args = Args(angRes=13, scale_factor=2, channels=8)
    p = lft.init_params(jax.random.PRNGKey(0), args)
    x = _rand((1, 1, 13 * 8, 13 * 8), 31) + 0.5
    ref = lft.forward(p, x, args, remat=False, fused=False)
    got = lft.forward(p, x, args, remat=False, fused=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    y = _rand((1, 1, 13 * 16, 13 * 16), 32) + 0.5
    g = jax.grad(lambda p: lft.l1_loss(
        lft.forward(p, x, args, remat=True, fused=True), y))(p)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in g.values())
