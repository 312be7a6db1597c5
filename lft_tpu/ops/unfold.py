"""Local-feature tokenization: unfold(3x3) + Linear == one 3x3 conv.

The reference's `SpaTrans.SAI2Token` (model/LFT.py:164-169) materializes
`F.unfold(k=3, pad=1)` patches `[hw, N, C*9]` and applies a bias-free
`Linear(C*9 -> 2C)`. That composition is mathematically a single 3x3
convolution, which is how we run it: one MXU-friendly conv, no patch
materialization. The torch `MLP.weight [out, C*9]` layout (feature index
`c*9 + ki*3 + kj`, zero padding) is reshaped to HWIO at apply time, so
converted checkpoints match exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv2d_nhwc(x: jnp.ndarray, w_torch: jnp.ndarray, padding="SAME") -> jnp.ndarray:
    """2-D conv on [B, H, W, Cin] with a torch-layout kernel [Cout, Cin, kh, kw]."""
    w = jnp.transpose(w_torch, (2, 3, 1, 0))  # -> HWIO
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def unfold3x3_linear(x: jnp.ndarray, mlp_weight: jnp.ndarray) -> jnp.ndarray:
    """[B, h, w, C] x torch Linear weight [out, C*9] -> [B, h, w, out].

    Equals `Linear(unfold(x, k=3, pad=1))` with torch's channel-major patch
    ordering (feature index c*9 + ki*3 + kj).
    """
    out_dim = mlp_weight.shape[0]
    C = mlp_weight.shape[1] // 9
    w = mlp_weight.reshape(out_dim, C, 3, 3)           # [out, C, ki, kj]
    return conv2d_nhwc(x, w, padding="SAME")
