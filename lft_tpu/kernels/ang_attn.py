"""Fused angular attention (Pallas TPU kernel).

The AngTrans attention (reference model/LFT.py:225-233) is full MHSA over
the A^2 = 25 view tokens, batched over every pixel: XLA lowers it to
~B*h*w*heads tiny [25 x dh x 25] matmuls (dh = 8) -- millions of fragmented
MXU ops at ~1% utilization.

This kernel sweeps the 25 KEY VIEWS with an online softmax (the same
structure as the spatial offset kernel, lft_tpu/kernels/local_attn.py):
for key view b, the score of every (pixel, query-view, head) is
  s_b = rowsum_per_head(q_tok * tile(k_b))
computed as one [A2*chunk, C] VPU multiply plus one [A2*chunk, C] x [C, H]
MXU GEMM via the head-summing matrix. All intermediates stay in VMEM;
the grid runs over pixel chunks.

Projections (q/k/v, out) remain XLA GEMMs. Dots inherit the ambient matmul
precision (exact under 'highest'). Forward-only; training uses the XLA
path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ang_kernel(s_mat_ref, q_ref, k_ref, v_ref, o_ref, *, n_views,
                num_heads):
    """q/k/v_ref: [A2, chunk, C]; o_ref: [A2, chunk, C];
    s_mat_ref: [C, H]."""
    A2, chunk, C = q_ref.shape
    dh = C // num_heads
    rows = A2 * chunk
    scale = jnp.float32(dh) ** -0.5

    q = q_ref[:, :, :].reshape(rows, C).astype(jnp.float32) * scale
    s_mat = s_mat_ref[:, :]

    def body(b, carry):
        m, l, acc = carry
        k_b = k_ref[b, :, :].astype(jnp.float32)
        v_b = v_ref[b, :, :].astype(jnp.float32)
        k_t = jnp.broadcast_to(k_b[None], (A2, chunk, C)).reshape(rows, C)
        v_t = jnp.broadcast_to(v_b[None], (A2, chunk, C)).reshape(rows, C)
        s = jnp.dot(q * k_t, s_mat,
                    preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, s)
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * corr + p
        corr_b = jax.lax.dot_general(
            corr, s_mat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p_b = jax.lax.dot_general(
            p, s_mat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc * corr_b + p_b * v_t

    m = jnp.full((rows, num_heads), -1e30, jnp.float32)
    l = jnp.zeros((rows, num_heads), jnp.float32)
    acc = jnp.zeros((rows, C), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_views, body, (m, l, acc))

    l_b = jax.lax.dot_general(
        l, s_mat, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = acc / l_b
    o_ref[:, :, :] = out.reshape(A2, chunk, C).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "chunk"))
def _ang_attention_pallas(q, k, v, num_heads: int, chunk: int = 64):
    # chunk bounds VMEM: ~8 live [A2*chunk, C] f32 temporaries in-kernel
    # plus double-buffered in/out blocks; 128 keeps a 25-view C=64 config
    # near ~7 MB of the 16 MB budget.
    """[N, A2, C] projected q/k/v -> [N, A2, C] full attention over A2."""
    N, A2, C = q.shape
    dh = C // num_heads
    pad = (-N) % chunk
    if pad:
        q = jnp.pad(q, [(0, pad), (0, 0), (0, 0)])
        k = jnp.pad(k, [(0, pad), (0, 0), (0, 0)])
        v = jnp.pad(v, [(0, pad), (0, 0), (0, 0)])
    Np = N + pad
    # view-major layout for the kernel: [A2, N, C]
    qt = q.transpose(1, 0, 2)
    kt = k.transpose(1, 0, 2)
    vt = v.transpose(1, 0, 2)
    s_mat = np.zeros((C, num_heads), np.float32)
    for hd in range(num_heads):
        s_mat[hd * dh:(hd + 1) * dh, hd] = 1.0
    kernel = functools.partial(_ang_kernel, n_views=A2, num_heads=num_heads)
    interpret = jax.devices()[0].platform != "tpu"
    grid = (Np // chunk,)
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        in_specs=[
            pl.BlockSpec((C, num_heads), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A2, chunk, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A2, chunk, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A2, chunk, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((A2, chunk, C), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A2, Np, C), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=Np * A2 * A2 * (4 * C + 6 * num_heads * C),
            bytes_accessed=4 * Np * A2 * C * 4,
            transcendentals=Np * A2 * A2 * 2 * num_heads),
    )(jnp.asarray(s_mat), qt, kt, vt)
    return out.transpose(1, 0, 2)[:N]


def ang_attention_pallas(qn: jnp.ndarray, v: jnp.ndarray,
                         in_proj_weight: jnp.ndarray,
                         out_proj_weight: jnp.ndarray,
                         num_heads: int) -> jnp.ndarray:
    """Drop-in for the AngTrans MHSA: qn [..., A2, C] normed tokens
    (q = k), v raw tokens; torch-packed projections. Returns [..., A2, C]."""
    *lead, A2, C = qn.shape
    wq, wk, wv = jnp.split(in_proj_weight, 3, axis=0)
    q_p = (qn @ wq.T).reshape(-1, A2, C)
    k_p = (qn @ wk.T).reshape(-1, A2, C)
    v_p = (v @ wv.T).reshape(-1, A2, C)
    out = _ang_attention_pallas(q_p, k_p, v_p, num_heads)
    out = out.reshape(*lead, A2, C)
    return out @ out_proj_weight.T
