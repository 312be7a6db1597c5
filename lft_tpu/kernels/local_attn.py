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

Forward-only: training uses the XLA path (autodiff); inference dispatch
picks this kernel via `attention_impl='pallas'`.
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
    scale = jnp.float32(dh) ** -0.5

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


def _offset_kernel(s_mat_ref, q_ref, k_ref, v_ref, o_ref, *, h, w, r,
                   num_heads):
    """Offset-sweep windowed attention with online (flash-style) softmax.

    Instead of per-tile halos, iterate over the (2r+1)^2 window OFFSETS.
    For offset (dy, dx), every query i attends to key i+(dy,dx):
      scores_o = rowsum_per_head(q * shift(k, o))  -- one elementwise mul on
      [hw, E] plus one [hw, E] x [E, H] MXU GEMM (full-128 contraction, via
      the head-summing matrix `s_mat`), vs. thousands of fragmented
      [t^2 x dh x hl^2] dots in the tile formulation.
    Head->lane broadcast of the [hw, H] softmax weights reuses s_mat^T as a
    GEMM (pltpu.repeat has tile-, not group-repeat, semantics). All dots
    inherit the ambient matmul precision: under
    jax.default_matmul_precision('highest') the kernel is f32-exact
    (~2e-7 vs CPU f32); at default precision error is ~3e-4 -- far below
    SR signal level.
    Runs ~(2r+1)^2 * 4 big VPU ops + 2*(2r+1)^2 MXU ops per view; all
    intermediates stay in VMEM.
    """
    E = q_ref.shape[-1]
    dh = E // num_heads
    hw = h * w
    scale = jnp.float32(dh) ** -0.5

    q = q_ref[0].reshape(hw, E).astype(jnp.float32) * scale
    s_mat = s_mat_ref[:, :]                              # [E, H] head summer

    idx = jax.lax.broadcasted_iota(jnp.int32, (hw, num_heads), 0)
    ys = idx // w
    xs = idx - ys * w

    m = jnp.full((hw, num_heads), -1e30, jnp.float32)
    l = jnp.zeros((hw, num_heads), jnp.float32)
    acc = jnp.zeros((hw, E), jnp.float32)

    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            k_o = k_ref[0, r + dy:r + dy + h, r + dx:r + dx + w, :]
            k_o = k_o.reshape(hw, E).astype(jnp.float32)
            v_o = v_ref[0, r + dy:r + dy + h, r + dx:r + dx + w, :]
            v_o = v_o.reshape(hw, E).astype(jnp.float32)
            s = jnp.dot(q * k_o, s_mat,
                        preferred_element_type=jnp.float32)  # [hw, H]
            valid = ((ys + dy >= 0) & (ys + dy < h)
                     & (xs + dx >= 0) & (xs + dx < w))
            s = jnp.where(valid, s, -1e30)
            m_new = jnp.maximum(m, s)
            corr = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * corr + p
            # head -> dh-consecutive-lanes broadcast via s_mat^T GEMM
            # (pltpu.repeat has tile, not group-repeat, semantics)
            corr_b = jax.lax.dot_general(
                corr, s_mat, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [hw, E]
            p_b = jax.lax.dot_general(
                p, s_mat, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc * corr_b + p_b * v_o
            m = m_new

    l_b = jax.lax.dot_general(
        l, s_mat, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = acc / l_b
    o_ref[0] = out.reshape(h, w, E).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "k"))
def _offset_attention_pallas(q_img, k_img, v_img, num_heads: int, k: int):
    B, h, w, E = q_img.shape
    r = k // 2
    kp = jnp.pad(k_img, [(0, 0), (r, r), (r, r), (0, 0)])
    vp = jnp.pad(v_img, [(0, 0), (r, r), (r, r), (0, 0)])
    dh = E // num_heads
    s_mat = np.zeros((E, num_heads), np.float32)
    for hd in range(num_heads):
        s_mat[hd * dh:(hd + 1) * dh, hd] = 1.0
    kernel = functools.partial(_offset_kernel, h=h, w=w, r=r,
                               num_heads=num_heads)
    interpret = jax.devices()[0].platform != "tpu"
    win2 = (2 * r + 1) ** 2
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((E, num_heads), lambda i: (0, 0),
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
            flops=B * win2 * (4 * h * w * E + 4 * h * w * E * num_heads),
            bytes_accessed=4 * B * h * w * E * 4,
            transcendentals=B * win2 * 2 * h * w * num_heads),
    )(jnp.asarray(s_mat), q_img, kp, vp)


# VMEM budget gate for the per-view offset kernel (q,k,v,acc + temps, f32)
_MAX_HW_OFFSET = 2048


def local_attention_pallas(qn: jnp.ndarray, v: jnp.ndarray,
                           in_proj_weight: jnp.ndarray,
                           out_proj_weight: jnp.ndarray,
                           num_heads: int, k: int = 5,
                           t: int = 8, variant: str = "offset") -> jnp.ndarray:
    """Drop-in replacement for `local_attention_tiled`: q = k = `qn` (the
    reference's asymmetric pre-norm), v raw; torch-packed projections.
    The q/k/v/out projections run as plain XLA GEMMs; only the windowed
    attention itself is a kernel."""
    B, h, w, E = qn.shape
    use_offset = variant == "offset" and h * w <= _MAX_HW_OFFSET
    if not use_offset and (h % t or w % t):
        from lft_tpu.ops.attention import local_attention
        return local_attention(qn, v, in_proj_weight, out_proj_weight,
                               num_heads, k=k, impl="tiled")
    wq, wk, wv = jnp.split(in_proj_weight, 3, axis=0)
    q_img = qn @ wq.T
    k_img = qn @ wk.T
    v_img = v @ wv.T
    if use_offset:
        out = _offset_attention_pallas(q_img, k_img, v_img, num_heads, k)
    else:
        out = _windowed_attention_pallas(q_img, k_img, v_img, num_heads, k, t)
    return out @ out_proj_weight.T
