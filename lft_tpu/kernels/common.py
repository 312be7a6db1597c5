"""Shared helpers for the Pallas attention kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bwd_io_dtype(dtype) -> jnp.dtype:
    """Backward-pass kernel I/O dtype.

    bf16 I/O halves the backward kernels' VMEM blocks and doubles their MXU
    rate, but must not silently degrade an f32 training run: the cast is
    applied only when the forward already ran in bf16 (the production
    configuration -- model params are cast to the compute dtype before the
    kernels, lft_tpu/models/lft.py). f32 inputs keep f32 gradients; on TPU
    the dispatcher must then pick a kernel whose f32 backward fits VMEM
    (the tile-dense spa_attn backward does; the head-packed one does not).
    """
    if (jax.devices()[0].platform == "tpu"
            and jnp.dtype(dtype) == jnp.bfloat16):
        return jnp.bfloat16
    return jnp.dtype(dtype)
