"""Shared helpers for the Pallas attention kernels."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Matmul sites of the fused whole-block kernels that can individually run
# at full f32 precision in the `--dtype mixed` shipping mode. Measured on
# the chip (2026-08-20): Mosaic honors precision=HIGHEST on f32 operands
# inside pallas kernels (rel err ~2e-7 vs f64), while the DEFAULT f32
# matmul path rounds operands to bf16 (rel err ~2.6e-3 -- the source of
# the r4 -0.157 dB PSNR shipping delta, PARITY_bf16.json); at the fused
# kernels' small output tiles the extra MXU passes are nearly free (the
# blocks are output-element-bound, docs/PERFORMANCE.md).
# spa_block.py sites: tok (9-tap tokenization), qk / v (projections),
# score (q@k^T), av (softmax@v), wo (out-proj), ffn (both MLP matmuls),
# lin (Token2SAI). ang_block.py sites are prefixed "a".
MM_HP_ALL = frozenset({"tok", "qk", "v", "score", "av", "wo", "ffn", "lin",
                       "aqkv", "ascore", "aav", "awo", "affn"})

# Shipping default for `--dtype mixed`: which sites run f32/HIGHEST
# (the rest cast operands to bf16 for single-pass MXU). Chosen with
# tools/parity_bf16.py + bench.py (see kernels/README.md).
MM_HP_DEFAULT = "all"


def mm_hp_sites(env: str = "LFT_MM_HP_SITES",
                default: str = MM_HP_DEFAULT) -> frozenset:
    """Trace-time set of full-precision matmul sites for the mixed mode.

    The env var overrides the in-code default: "all", "none"/"", or a
    comma list drawn from MM_HP_ALL (unknown names raise -- a typo must
    not silently run at low precision). Read at TRACE time: set it
    before the first model call of the process (the A/B sweep tools run
    one config per process)."""
    spec = os.environ.get(env, default).strip()
    if spec == "all":
        return MM_HP_ALL
    if spec in ("", "none"):
        return frozenset()
    sites = frozenset(s.strip() for s in spec.split(",") if s.strip())
    bad = sites - MM_HP_ALL
    if bad:
        raise ValueError(f"unknown {env} entries {sorted(bad)}; "
                         f"valid: {sorted(MM_HP_ALL)}")
    return sites


def mm_site_plan(mm_half: bool, io, sites: frozenset):
    """Per-site (operand dtype, dot precision) plan for a fused kernel.

    Returns (mdt, mpr): two dicts over MM_HP_ALL. With mm_half=False the
    plan is the identity (operands stay in the kernel IO dtype, default
    precision) so the f32/bf16 paths are bit-identical to the pre-mixed
    kernels. With mm_half=True (io is f32), an hp site keeps f32
    operands and runs the MXU at precision=HIGHEST; a non-hp site casts
    operands to bf16 for single-pass MXU rate."""
    mdt, mpr = {}, {}
    for s in MM_HP_ALL:
        if mm_half and s in sites:
            mdt[s], mpr[s] = jnp.float32, jax.lax.Precision.HIGHEST
        elif mm_half:
            mdt[s], mpr[s] = jnp.bfloat16, None
        else:
            mdt[s], mpr[s] = io, None
    return mdt, mpr


def bwd_io_dtype(dtype, mm_half: bool = False) -> jnp.dtype:
    """Backward-pass kernel I/O dtype.

    bf16 I/O halves the backward kernels' VMEM blocks and doubles their MXU
    rate, but must not silently degrade an f32 training run: the cast is
    applied only when the forward already ran at half-precision matmul
    operands -- dtype bf16, or the `mixed` shipping mode (mm_half=True,
    whose f32-IO backward blocks exceed the 16 MiB scoped-VMEM budget at
    the production train geometry; its gradient quality equals bf16
    training and is validated end-to-end by the recipe comparison,
    runs/ref_recipe_s4_mixed). Model params are cast to the compute dtype
    before the kernels (lft_tpu/models/lft.py). f32 inputs keep f32
    gradients; on TPU the dispatcher must then pick a kernel whose f32
    backward fits VMEM (the tile-dense spa_attn backward does; the
    head-packed one does not)."""
    if (jax.devices()[0].platform == "tpu"
            and (jnp.dtype(dtype) == jnp.bfloat16 or mm_half)):
        return jnp.bfloat16
    return jnp.dtype(dtype)
