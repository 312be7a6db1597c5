"""Custom VJP for the fused angular attention (trainable Pallas path).

Same flash-style identities as lft_tpu/kernels/local_attn_vjp.py, adapted
to the key-view sweep of lft_tpu/kernels/ang_attn.py: queries are all
(view a, pixel) tokens of a chunk, keys/values are swept over the A^2
views; gradients dK[b]/dV[b] reduce over the query-view axis.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lft_tpu.kernels.local_attn_vjp import _bcast, _head_sum_matrix


def _fwd_kernel(s_mat_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, *,
                n_views, num_heads):
    A2, chunk, C = q_ref.shape
    dh = C // num_heads
    rows = A2 * chunk
    scale = jnp.float32(float(dh) ** -0.5)
    q = q_ref[:, :, :].reshape(rows, C).astype(jnp.float32) * scale
    s_mat = s_mat_ref[:, :]

    def body(b, carry):
        m, l, acc = carry
        k_b = k_ref[b, :, :].astype(jnp.float32)
        v_b = v_ref[b, :, :].astype(jnp.float32)
        k_t = jnp.broadcast_to(k_b[None], (A2, chunk, C)).reshape(rows, C)
        v_t = jnp.broadcast_to(v_b[None], (A2, chunk, C)).reshape(rows, C)
        s = jnp.dot(q * k_t, s_mat, preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, s)
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        return (m_new, l * corr + p,
                acc * _bcast(corr, s_mat) + _bcast(p, s_mat) * v_t)

    m = jnp.full((rows, num_heads), -1e30, jnp.float32)
    l = jnp.zeros((rows, num_heads), jnp.float32)
    acc = jnp.zeros((rows, C), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_views, body, (m, l, acc))
    out = acc / _bcast(l, s_mat)
    o_ref[:, :, :] = out.reshape(A2, chunk, C).astype(o_ref.dtype)
    m_ref[:, :] = m
    l_ref[:, :] = l


def _bwd_kernel(s_mat_ref, q_ref, k_ref, v_ref, do_ref, o_ref, m_ref, l_ref,
                dq_ref, dk_ref, dv_ref, *, n_views, num_heads):
    A2, chunk, C = q_ref.shape
    dh = C // num_heads
    rows = A2 * chunk
    scale = jnp.float32(float(dh) ** -0.5)
    s_mat = s_mat_ref[:, :]
    q_raw = q_ref[:, :, :].reshape(rows, C).astype(jnp.float32)
    q = q_raw * scale
    do = do_ref[:, :, :].reshape(rows, C).astype(jnp.float32)
    out = o_ref[:, :, :].reshape(rows, C).astype(jnp.float32)
    m = m_ref[:, :]
    l = l_ref[:, :]
    D = jnp.dot(do * out, s_mat, preferred_element_type=jnp.float32)

    def body(b, dq):
        k_b = k_ref[b, :, :].astype(jnp.float32)
        v_b = v_ref[b, :, :].astype(jnp.float32)
        k_t = jnp.broadcast_to(k_b[None], (A2, chunk, C)).reshape(rows, C)
        v_t = jnp.broadcast_to(v_b[None], (A2, chunk, C)).reshape(rows, C)
        s = jnp.dot(q * k_t, s_mat, preferred_element_type=jnp.float32)
        a = jnp.exp(s - m) / l
        dov = jnp.dot(do * v_t, s_mat, preferred_element_type=jnp.float32)
        ds = a * (dov - D)
        ds_b = _bcast(ds, s_mat)
        dq = dq + ds_b * k_t * scale
        dk_b = jnp.sum((ds_b * q_raw * scale).reshape(A2, chunk, C), axis=0)
        dv_b = jnp.sum((_bcast(a, s_mat) * do).reshape(A2, chunk, C), axis=0)
        dk_ref[b, :, :] = dk_b.astype(dk_ref.dtype)
        dv_ref[b, :, :] = dv_b.astype(dv_ref.dtype)
        return dq

    dq = jax.lax.fori_loop(0, n_views, body, jnp.zeros((rows, C), jnp.float32))
    dq_ref[:, :, :] = dq.reshape(A2, chunk, C).astype(dq_ref.dtype)


_CHUNK = 32  # VMEM: C=64 lanes pad to 128, doubling every buffer; keep chunks small


def _specs(A2, chunk, C, num_heads):
    tok = pl.BlockSpec((A2, chunk, C), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((A2 * chunk, num_heads), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    smat = pl.BlockSpec((C, num_heads), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    return tok, stat, smat


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ang_attention(q, k, v, num_heads: int):
    """Differentiable fused full attention over the view axis:
    [N, A2, C] projected q/k/v -> [N, A2, C]."""
    out, _, _ = _fwd(q, k, v, num_heads)
    return out


def _prep(x, chunk):
    N = x.shape[0]
    pad = (-N) % chunk
    if pad:
        x = jnp.pad(x, [(0, pad), (0, 0), (0, 0)])
    return x.transpose(1, 0, 2), N + pad  # [A2, Np, C]


def _fwd(q, k, v, num_heads):
    N, A2, C = q.shape
    chunk = _CHUNK
    qt, Np = _prep(q, chunk)
    kt, _ = _prep(k, chunk)
    vt, _ = _prep(v, chunk)
    tok, stat, smat = _specs(A2, chunk, C, num_heads)
    kernel = functools.partial(_fwd_kernel, n_views=A2, num_heads=num_heads)
    interpret = jax.devices()[0].platform != "tpu"
    s_mat = jnp.asarray(_head_sum_matrix(C, num_heads))
    out, m, l = pl.pallas_call(
        kernel, interpret=interpret, grid=(Np // chunk,),
        in_specs=[smat, tok, tok, tok],
        out_specs=(tok, stat, stat),
        out_shape=(jax.ShapeDtypeStruct((A2, Np, C), q.dtype),
                   jax.ShapeDtypeStruct((Np * A2, num_heads), jnp.float32),
                   jax.ShapeDtypeStruct((Np * A2, num_heads), jnp.float32)),
    )(s_mat, qt, kt, vt)
    return out.transpose(1, 0, 2)[:N], m, l


def _vjp_fwd(q, k, v, num_heads):
    out, m, l = _fwd(q, k, v, num_heads)
    return out, (q, k, v, out, m, l)


def _vjp_bwd(num_heads, res, dout):
    q, k, v, out, m, l = res
    N, A2, C = q.shape
    chunk = _CHUNK
    qt, Np = _prep(q, chunk)
    kt, _ = _prep(k, chunk)
    vt, _ = _prep(v, chunk)
    dot_, _ = _prep(dout.astype(q.dtype), chunk)
    outt, _ = _prep(out, chunk)
    tok, stat, smat = _specs(A2, chunk, C, num_heads)
    kernel = functools.partial(_bwd_kernel, n_views=A2, num_heads=num_heads)
    interpret = jax.devices()[0].platform != "tpu"
    s_mat = jnp.asarray(_head_sum_matrix(C, num_heads))
    dq, dk, dv = pl.pallas_call(
        kernel, interpret=interpret, grid=(Np // chunk,),
        in_specs=[smat, tok, tok, tok, tok, tok, stat, stat],
        out_specs=(tok, tok, tok),
        out_shape=(jax.ShapeDtypeStruct((A2, Np, C), q.dtype),
                   jax.ShapeDtypeStruct((A2, Np, C), jnp.float32),
                   jax.ShapeDtypeStruct((A2, Np, C), jnp.float32)),
    )(s_mat, qt, kt, vt, dot_, outt, m, l)
    tr = lambda x: x.transpose(1, 0, 2)[:N]
    return tr(dq), tr(dk).astype(k.dtype), tr(dv).astype(v.dtype)


ang_attention.defvjp(_vjp_fwd, _vjp_bwd)


def _pack_pairs(x, A2, C):
    """[N, A2, C] -> [N/2, A2, 2C]: two pixels' tokens side by side.

    Per-head attention is independent and heads occupy consecutive channel
    groups, so a 2C-channel, 2H-head attention over super-tokens computes
    both pixels' H-head attentions EXACTLY -- while filling all 128 vector
    lanes (C = 64 alone wastes half) and halving the kernel grid.
    """
    N = x.shape[0]
    return x.reshape(N // 2, 2, A2, C).transpose(0, 2, 1, 3) \
            .reshape(N // 2, A2, 2 * C)


def _unpack_pairs(x, A2, C):
    N2 = x.shape[0]
    return x.reshape(N2, A2, 2, C).transpose(0, 2, 1, 3) \
            .reshape(N2 * 2, A2, C)


def projected_pair_packed(qn, v, in_proj_weight, out_proj_weight,
                          num_heads: int, attention):
    """Shared AngTrans wrapper (q = k = qn normed, v raw; torch-packed
    projections) on [..., A2, C] tokens: XLA GEMM projections, lane-filling
    pixel-pair packing when 2C fits the 128 lanes, then `attention(q, k, v,
    heads)` on [N, A2, C']. Used by both the key-sweep and block-diag MXU
    kernels so the packing condition lives in exactly one place."""
    *lead, A2, C = qn.shape
    wq, wk, wv = jnp.split(in_proj_weight, 3, axis=0)
    q_p = (qn @ wq.T).reshape(-1, A2, C)
    k_p = (qn @ wk.T).reshape(-1, A2, C)
    v_p = (v @ wv.T).reshape(-1, A2, C)
    N = q_p.shape[0]
    pack = 2 if (2 * C <= 128 and N % 2 == 0) else 1
    if pack == 2:
        out = attention(_pack_pairs(q_p, A2, C), _pack_pairs(k_p, A2, C),
                        _pack_pairs(v_p, A2, C), 2 * num_heads)
        out = _unpack_pairs(out, A2, C)
    else:
        out = attention(q_p, k_p, v_p, num_heads)
    return out.reshape(*lead, A2, C) @ out_proj_weight.T


def ang_attention_pallas_ad(qn, v, in_proj_weight, out_proj_weight,
                            num_heads: int):
    """Differentiable drop-in for the AngTrans MHSA (q = k = qn normed,
    v raw; torch-packed projections) on [..., A2, C] tokens."""
    return projected_pair_packed(qn, v, in_proj_weight, out_proj_weight,
                                 num_heads, ang_attention)
