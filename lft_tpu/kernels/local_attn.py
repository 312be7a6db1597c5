"""Fused local-window spatial attention (Pallas TPU kernel).

Replaces the XLA tiled-halo path (lft_tpu/ops/attention.py) for the
SpaTrans attention (reference model/LFT.py:176-187). The XLA path
materializes per-tile key/value halos and the [B, H, tiles, t^2, hl^2]
score tensor in HBM (~2 GB of traffic per chunk) and lowers to ~50k tiny
[64 x 16 x 144] batched matmuls. This kernel instead:

* grids over the folded batch-view axis (one 32x32x128 token image per
  step -- ~1.5 MB of q/k/v, comfortably in VMEM);
* computes each 8x8 query tile against its 12x12 key/value halo entirely
  in VMEM/registers (per-head MXU dots, fused masked softmax);
* writes only the [h, w, E] output back to HBM.

The q/k/v and output projections stay in XLA -- they are large clean GEMMs
the MXU already runs well; the kernel covers exactly the part XLA
fragments. Semantics are identical to `local_attention_tiled` (and hence
to the reference's dense-masked softmax): verified by A/B parity tests in
interpret mode (tests/test_kernels.py) and on device.

The default dispatch is the hybrid custom-VJP (kernels/spa_attn.py):
head-packed MXU kernels per context, offset-sweep as fallback -- so
`attention_impl='pallas'` works for both inference and training. The
tile-halo variant below remains as the fallback for patches too large
for the per-view VMEM budget. See kernels/README.md for the full matrix.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lft_tpu.ops.attention import _halo_mask


def _window_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *, h, w, t, r,
                   num_heads):
    """One grid step = one view image.

    q_ref: [1, h, w, E]; k_ref/v_ref: [1, h+2r, w+2r, E] (zero-padded);
    mask_ref: [nth*ntw, t*t, hl*hl] additive mask; o_ref: [1, h, w, E].
    """
    E = q_ref.shape[-1]
    dh = E // num_heads
    hl = t + 2 * r
    nth, ntw = h // t, w // t
    scale = jnp.float32(float(dh) ** -0.5)

    for ti in range(nth):
        for tj in range(ntw):
            q_t = q_ref[0, ti * t:(ti + 1) * t, tj * t:(tj + 1) * t, :]
            q_t = q_t.reshape(t * t, E).astype(jnp.float32) * scale
            k_t = k_ref[0, ti * t:ti * t + hl, tj * t:tj * t + hl, :]
            k_t = k_t.reshape(hl * hl, E).astype(jnp.float32)
            v_t = v_ref[0, ti * t:ti * t + hl, tj * t:tj * t + hl, :]
            v_t = v_t.reshape(hl * hl, E).astype(jnp.float32)
            mask = mask_ref[ti * ntw + tj, :, :]

            outs = []
            for hd in range(num_heads):
                sl = slice(hd * dh, (hd + 1) * dh)
                s = jax.lax.dot_general(
                    q_t[:, sl], k_t[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)       # [t^2, hl^2]
                s = s + mask
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                denom = jnp.sum(e, axis=-1, keepdims=True)
                a = e / denom
                outs.append(jnp.dot(a, v_t[:, sl],
                                    preferred_element_type=jnp.float32))
            o_t = jnp.concatenate(outs, axis=-1)              # [t^2, E]
            o_ref[0, ti * t:(ti + 1) * t, tj * t:(tj + 1) * t, :] = (
                o_t.reshape(t, t, E).astype(o_ref.dtype))


@functools.partial(jax.jit, static_argnames=("num_heads", "k", "t"))
def _windowed_attention_pallas(q_img, k_img, v_img, num_heads: int, k: int,
                               t: int):
    """[B, h, w, E] projected q/k/v -> [B, h, w, E] windowed attention."""
    B, h, w, E = q_img.shape
    r = k // 2
    kp = jnp.pad(k_img, [(0, 0), (r, r), (r, r), (0, 0)])
    vp = jnp.pad(v_img, [(0, 0), (r, r), (r, r), (0, 0)])
    nth, ntw = h // t, w // t
    hl = t + 2 * r
    mask = jnp.asarray(_halo_mask(h, w, t, k).reshape(nth * ntw, t * t, hl * hl))

    kernel = functools.partial(_window_kernel, h=h, w=w, t=t, r=r,
                               num_heads=num_heads)
    flops_per_view = nth * ntw * num_heads * 2 * (t * t) * (hl * hl) * (E // num_heads) * 2
    interpret = jax.devices()[0].platform != "tpu"  # CPU tests run interpreted
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((nth * ntw, t * t, hl * hl), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, E), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * r, w + 2 * r, E), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * r, w + 2 * r, E), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, E), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, w, E), q_img.dtype),
        cost_estimate=pl.CostEstimate(
            flops=B * flops_per_view,
            bytes_accessed=4 * B * h * w * E * 4,
            transcendentals=B * nth * ntw * num_heads * t * t * hl * hl),
    )(mask, q_img, kp, vp)


# VMEM budget gate for the per-view offset kernel (q,k,v,acc + temps, f32)
_MAX_HW_OFFSET = 2048

# Valid spatial-attention kernel variants ('auto' resolves per context)
SPA_VARIANTS = ("auto", "mxu", "offset", "tile")


def local_attention_pallas(qn: jnp.ndarray, v: jnp.ndarray,
                           in_proj_weight: jnp.ndarray,
                           out_proj_weight: jnp.ndarray,
                           num_heads: int, k: int = 5,
                           t: int = 8, variant: str = "auto") -> jnp.ndarray:
    """Drop-in replacement for `local_attention_tiled`: q = k = `qn` (the
    reference's asymmetric pre-norm), v raw; torch-packed projections.
    The q/k/v/out projections run as plain XLA GEMMs; only the windowed
    attention itself is a kernel.

    variant: 'auto' resolves per context via a hybrid custom-VJP
    (kernels/spa_attn.py): offset-sweep kernel for the inference primal,
    tile-dense MXU kernels for the training fwd/bwd -- each measured
    fastest in its role on v5e. 'mxu' | 'offset' | 'tile' force one
    implementation for both roles; env `LFT_SPA_VARIANT` overrides
    'auto' (perf A/B without code edits)."""
    import os
    if variant == "auto":
        variant = os.environ.get("LFT_SPA_VARIANT", "auto")
    if variant not in SPA_VARIANTS:
        raise ValueError(
            f"unknown spatial attention variant {variant!r} "
            f"(LFT_SPA_VARIANT?); valid: {SPA_VARIANTS}")
    B, h, w, E = qn.shape
    from lft_tpu.kernels.spa_attn import (
        local_attention_tile_mxu, pick_tile, windowed_attention_hybrid)
    tileable = pick_tile(h, w) is not None and E % num_heads == 0
    if variant == "auto" and tileable and h * w <= _MAX_HW_OFFSET:
        return local_attention_tile_mxu(qn, v, in_proj_weight,
                                        out_proj_weight, num_heads, k,
                                        attention=windowed_attention_hybrid)
    if variant in ("auto", "mxu") and tileable:
        return local_attention_tile_mxu(qn, v, in_proj_weight,
                                        out_proj_weight, num_heads, k)
    use_offset = (variant in ("auto", "offset")
                  and h * w <= _MAX_HW_OFFSET)
    if not use_offset and (h % t or w % t):
        from lft_tpu.ops.attention import local_attention
        return local_attention(qn, v, in_proj_weight, out_proj_weight,
                               num_heads, k=k, impl="tiled")
    wq, wk, wv = jnp.split(in_proj_weight, 3, axis=0)
    q_img = qn @ wq.T
    k_img = qn @ wk.T
    v_img = v @ wv.T
    if use_offset:
        from lft_tpu.kernels.local_attn_vjp import windowed_attention
        out = windowed_attention(q_img, k_img, v_img, num_heads, k)
    else:
        out = _windowed_attention_pallas(q_img, k_img, v_img, num_heads, k, t)
    return out @ out_proj_weight.T
