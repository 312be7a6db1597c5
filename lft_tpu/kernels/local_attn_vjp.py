"""Custom VJP for the fused local-window attention -> trainable Pallas path.

Forward: the offset-sweep kernel (lft_tpu/kernels/local_attn.py), extended
to also emit the per-(pixel, head) softmax statistics (running max `m` and
normalizer `l`). Backward: a second offset-sweep kernel using the standard
flash-attention identities, adapted to window offsets:

  D_i      = rowsum_h(dO_i * O_i)                       (= sum_j a_ij dO_i.V_j)
  a_o      = exp(s_o - m) / l                (recomputed from saved m, l)
  dS_o     = a_o * (rowsum_h(dO * V_o) - D)
  dQ      += bcast(dS_o) * K_o * scale
  dK[i+o] += dS_o[i] * Q[i] * scale      -> accumulate into a padded buffer
  dV[i+o] += a_o[i]  * dO[i]             -> accumulate into a padded buffer

Out-of-image offsets have a = dS = 0 (the forward's -inf masking), so the
padded-buffer margins receive only zeros and are cropped afterwards.

With this, `attention_impl='pallas'` works under jax.grad, making the
fused kernels usable for training, not just inference.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _head_sum_matrix(E: int, num_heads: int) -> np.ndarray:
    dh = E // num_heads
    s = np.zeros((E, num_heads), np.float32)
    for hd in range(num_heads):
        s[hd * dh:(hd + 1) * dh, hd] = 1.0
    return s


def _bcast(x, s_mat):
    """[rows, H] -> [rows, E] by head-group broadcast (s_mat^T GEMM)."""
    return jax.lax.dot_general(
        x, s_mat, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fwd_kernel(s_mat_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, *,
                h, w, r, num_heads, nb, h_total, loop: str = "unroll"):
    """h is the LOCAL band height (h_total/nb); the grid is (B*nb,) with
    band index = program_id % nb. Row banding keeps each step's VMEM
    blocks + stack under the 16 MB scoped budget.

    loop='unroll' (static 25x sweep) is ~2x faster for pure inference;
    loop='switch' (fori + lax.switch over static dx) is much faster when
    the kernel runs inside a rematerialized training step, where VMEM
    pressure from co-resident buffers kills the unrolled schedule. The
    custom-vjp forward therefore uses 'switch', the primal 'unroll'."""
    E = q_ref.shape[-1]
    dh = E // num_heads
    hw = h * w
    scale = jnp.float32(float(dh) ** -0.5)
    q = q_ref[0].reshape(hw, E).astype(jnp.float32) * scale
    s_mat = s_mat_ref[:, :]
    band = pl.program_id(0) % nb
    idx = jax.lax.broadcasted_iota(jnp.int32, (hw, num_heads), 0)
    ys = idx // w + band * h                  # GLOBAL row for border masks
    xs = idx - (idx // w) * w

    def step_at(dy, dx, carry, k_slice, v_slice):
        m, l, acc = carry
        k_o = k_slice.reshape(hw, E).astype(jnp.float32)
        v_o = v_slice.reshape(hw, E).astype(jnp.float32)
        s = jnp.dot(q * k_o, s_mat, preferred_element_type=jnp.float32)
        valid = ((ys + dy >= 0) & (ys + dy < h_total)
                 & (xs + dx >= 0) & (xs + dx < w))
        s = jnp.where(valid, s, -1e30)
        m_new = jnp.maximum(m, s)
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        return (m_new, l * corr + p,
                acc * _bcast(corr, s_mat) + _bcast(p, s_mat) * v_o)

    carry = (jnp.full((hw, num_heads), -1e30, jnp.float32),
             jnp.zeros((hw, num_heads), jnp.float32),
             jnp.zeros((hw, E), jnp.float32))
    win = 2 * r + 1
    if loop == "unroll":
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                carry = step_at(dy, dx, carry,
                                k_ref[0, r + dy:r + dy + h, r + dx:r + dx + w, :],
                                v_ref[0, r + dy:r + dy + h, r + dx:r + dx + w, :])
    else:
        def body(o, carry):
            dy = o // win - r

            def branch(dx):
                def f(carry):
                    return step_at(dy, dx, carry,
                                   k_ref[0, pl.ds(r + dy, h),
                                         r + dx:r + dx + w, :],
                                   v_ref[0, pl.ds(r + dy, h),
                                         r + dx:r + dx + w, :])
                return f
            return jax.lax.switch(o % win,
                                  [branch(dx) for dx in range(-r, r + 1)],
                                  carry)
        carry = jax.lax.fori_loop(0, win * win, body, carry)
    m, l, acc = carry
    out = acc / _bcast(l, s_mat)
    o_ref[0] = out.reshape(h, w, E).astype(o_ref.dtype)
    m_ref[0] = m
    l_ref[0] = l


def _bwd_kernel(s_mat_ref, q_ref, k_ref, v_ref, do_ref, d_ref, m_ref, l_ref,
                dq_ref, dk_ref, dv_ref, *, h, w, r, num_heads, nb, h_total):
    """dk_ref/dv_ref are PADDED [1, h+2r, w+2r, E] accumulators. D
    (= rowsum_h(dO * O), flash identity) is precomputed in XLA to keep the
    kernel under the VMEM budget; contrib_k uses the SCALED q directly
    (ds * q_raw * scale == ds * q)."""
    E = q_ref.shape[-1]
    dh = E // num_heads
    hw = h * w
    scale = jnp.float32(float(dh) ** -0.5)
    s_mat = s_mat_ref[:, :]
    q = q_ref[0].reshape(hw, E).astype(jnp.float32) * scale
    do = do_ref[0].reshape(hw, E).astype(jnp.float32)
    m = m_ref[0]
    l = l_ref[0]
    band = pl.program_id(0) % nb
    idx = jax.lax.broadcasted_iota(jnp.int32, (hw, num_heads), 0)
    ys = idx // w + band * h                  # GLOBAL row for border masks
    xs = idx - (idx // w) * w

    D = d_ref[0]                                                  # [hw, H]
    dk_ref[0] = jnp.zeros_like(dk_ref[0])
    dv_ref[0] = jnp.zeros_like(dv_ref[0])

    # fori + lax.switch over the static dx branches: measured ~2.7x faster
    # than a 25x static unroll here (the unroll's 25 in-place dk/dv
    # read-modify-writes schedule poorly), and the mutually-exclusive
    # branches keep stack VMEM to one iteration. dy slices are dynamic
    # (allowed on the h dim); dx must be static (sublane alignment).
    win = 2 * r + 1

    def body(o, dq):
        dy = o // win - r

        def branch(dx):
            def f(dq):
                xsl = slice(r + dx, r + dx + w)
                k_o = k_ref[0, pl.ds(r + dy, h), xsl, :]
                k_o = k_o.reshape(hw, E).astype(jnp.float32)
                v_o = v_ref[0, pl.ds(r + dy, h), xsl, :]
                v_o = v_o.reshape(hw, E).astype(jnp.float32)
                s = jnp.dot(q * k_o, s_mat,
                            preferred_element_type=jnp.float32)
                valid = ((ys + dy >= 0) & (ys + dy < h_total)
                         & (xs + dx >= 0) & (xs + dx < w))
                s = jnp.where(valid, s, -1e30)
                a = jnp.exp(s - m) / l                        # [hw, H]
                dov = jnp.dot(do * v_o, s_mat,
                              preferred_element_type=jnp.float32)
                ds = a * (dov - D)                            # [hw, H]
                ds_b = _bcast(ds, s_mat)                      # [hw, E]
                contrib_k = (ds_b * q).reshape(h, w, E)
                contrib_v = (_bcast(a, s_mat) * do).reshape(h, w, E)
                cur_k = dk_ref[0, pl.ds(r + dy, h), xsl, :]
                dk_ref[0, pl.ds(r + dy, h), xsl, :] = (
                    cur_k + contrib_k.astype(dk_ref.dtype))
                cur_v = dv_ref[0, pl.ds(r + dy, h), xsl, :]
                dv_ref[0, pl.ds(r + dy, h), xsl, :] = (
                    cur_v + contrib_v.astype(dv_ref.dtype))
                return dq + ds_b * k_o * scale
            return f

        return jax.lax.switch(o % win,
                              [branch(dx) for dx in range(-r, r + 1)], dq)

    dq = jax.lax.fori_loop(0, win * win, body,
                           jnp.zeros((hw, E), jnp.float32))
    # dq accumulated with scaled q/k: the ds_b*k_o*scale terms already
    # include the scale factor exactly once
    dq_ref[0] = dq.reshape(h, w, E).astype(dq_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def windowed_attention(q_img, k_img, v_img, num_heads: int, k: int):
    """Differentiable fused windowed attention on [B, h, w, E] projected
    q/k/v (q pre-scaled inside; window k x k).

    NOTE: on TPU the backward streams k/v/dO as bf16 REGARDLESS of the
    input dtype (accumulation stays f32) -- without it the kernel exceeds
    the 16 MB scoped-VMEM budget. An f32 training run that must keep f32
    gradients should use the tile-dense/head-packed hybrid path
    (kernels/spa_attn.py), which honors the input dtype."""
    out, _, _ = _fwd(q_img, k_img, v_img, num_heads, k)
    return out


def _num_bands(h: int, w: int, limit: int = 512) -> int:
    """Rows per band chosen so one band's buffers fit the VMEM budget.
    The forward (fewer live buffers) tolerates a higher row limit than the
    backward; fewer bands = fewer grid steps = less per-step overhead."""
    for nb in (1, 2, 4, 8):
        if h % nb == 0 and (h // nb) * w <= limit:
            return nb
    return 1


def _band_padded(xp, nb, h2, r):
    """[B, h+2r, w', E] padded -> [B*nb, h2+2r, w', E] overlapping bands."""
    if nb == 1:
        return xp
    bands = [xp[:, i * h2:i * h2 + h2 + 2 * r] for i in range(nb)]
    st = jnp.stack(bands, axis=1)
    return st.reshape(-1, *st.shape[2:])


def _band_img(x, nb):
    """[B, h, w, E] -> [B*nb, h/nb, w, E] (pure reshape)."""
    if nb == 1:
        return x
    B, h, w, E = x.shape
    return x.reshape(B * nb, h // nb, w, E)


def _unband_img(x, nb):
    if nb == 1:
        return x
    Bnb, h2, w, E = x.shape
    return x.reshape(Bnb // nb, nb * h2, w, E)


def _call_fwd(q_img, kp, vp, num_heads, k, loop="unroll"):
    B, h, w, E = q_img.shape
    r = k // 2
    nb = _num_bands(h, w, limit=1024 if loop == "unroll" else 512)
    h2 = h // nb
    s_mat = jnp.asarray(_head_sum_matrix(E, num_heads))
    kernel = functools.partial(_fwd_kernel, h=h2, w=w, r=r,
                               num_heads=num_heads, nb=nb, h_total=h,
                               loop=loop)
    interpret = jax.devices()[0].platform != "tpu"
    qb = _band_img(q_img, nb)
    kb = _band_padded(kp, nb, h2, r)
    vb = _band_padded(vp, nb, h2, r)
    Bn = B * nb
    pad_spec = pl.BlockSpec((1, h2 + 2 * r, w + 2 * r, E),
                            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((1, h2, w, E), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, h2 * w, num_heads), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out, m, l = pl.pallas_call(
        kernel, interpret=interpret, grid=(Bn,),
        in_specs=[pl.BlockSpec((E, num_heads), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  img_spec, pad_spec, pad_spec],
        out_specs=(img_spec, stat_spec, stat_spec),
        out_shape=(jax.ShapeDtypeStruct((Bn, h2, w, E), q_img.dtype),
                   jax.ShapeDtypeStruct((Bn, h2 * w, num_heads), jnp.float32),
                   jax.ShapeDtypeStruct((Bn, h2 * w, num_heads), jnp.float32)),
    )(s_mat, qb, kb, vb)
    return _unband_img(out, nb), m, l


def _fwd(q_img, k_img, v_img, num_heads, k, loop="unroll"):
    r = k // 2
    kp = jnp.pad(k_img, [(0, 0), (r, r), (r, r), (0, 0)])
    vp = jnp.pad(v_img, [(0, 0), (r, r), (r, r), (0, 0)])
    return _call_fwd(q_img, kp, vp, num_heads, k, loop=loop)


def _vjp_fwd(q_img, k_img, v_img, num_heads, k):
    out, m, l = _fwd(q_img, k_img, v_img, num_heads, k, loop="switch")
    return out, (q_img, k_img, v_img, out, m, l)


def _vjp_bwd(num_heads, k, res, dout):
    q_img, k_img, v_img, out, m, l = res
    B, h, w, E = q_img.shape
    r = k // 2
    # On TPU, stream k/v/dO into the backward kernel as bf16 (accumulation
    # inside stays f32): halves their VMEM blocks, without which the kernel
    # exceeds the 16 MB scoped budget. CPU interpret keeps f32 so gradient
    # tests stay exact.
    io_dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else q_img.dtype
    kp = jnp.pad(k_img.astype(io_dtype), [(0, 0), (r, r), (r, r), (0, 0)])
    vp = jnp.pad(v_img.astype(io_dtype), [(0, 0), (r, r), (r, r), (0, 0)])
    dout = dout.astype(io_dtype)
    s_mat = jnp.asarray(_head_sum_matrix(E, num_heads))
    nb = _num_bands(h, w)
    h2 = h // nb
    kernel = functools.partial(_bwd_kernel, h=h2, w=w, r=r,
                               num_heads=num_heads, nb=nb, h_total=h)
    interpret = jax.devices()[0].platform != "tpu"
    img_spec = pl.BlockSpec((1, h2, w, E), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    pad_spec = pl.BlockSpec((1, h2 + 2 * r, w + 2 * r, E),
                            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, h2 * w, num_heads), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    # flash identity: D_i = rowsum_h(dO_i * O_i); tiny, so done in XLA
    D = ((dout.astype(jnp.float32) * out.astype(jnp.float32))
         .reshape(B * nb, h2 * w, E) @ s_mat)
    # fwd may have used a different band count; stats rows are y-major so a
    # reshape restores alignment
    m = m.reshape(B * nb, h2 * w, num_heads)
    l = l.reshape(B * nb, h2 * w, num_heads)
    Bn = B * nb
    dq, dk_b, dv_b = pl.pallas_call(
        kernel, interpret=interpret, grid=(Bn,),
        in_specs=[pl.BlockSpec((E, num_heads), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  img_spec, pad_spec, pad_spec, img_spec, stat_spec,
                  stat_spec, stat_spec],
        out_specs=(img_spec, pad_spec, pad_spec),
        out_shape=(jax.ShapeDtypeStruct((Bn, h2, w, E), q_img.dtype),
                   jax.ShapeDtypeStruct((Bn, h2 + 2 * r, w + 2 * r, E),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((Bn, h2 + 2 * r, w + 2 * r, E),
                                        jnp.float32)),
    )(s_mat, _band_img(q_img, nb), _band_padded(kp, nb, h2, r),
      _band_padded(vp, nb, h2, r), _band_img(dout, nb), D, m, l)
    dq = _unband_img(dq, nb)
    if nb == 1:
        dk_pad, dv_pad = dk_b, dv_b
    else:
        # overlap-add the bands' padded accumulators back together
        dkr = dk_b.reshape(B, nb, h2 + 2 * r, w + 2 * r, E)
        dvr = dv_b.reshape(B, nb, h2 + 2 * r, w + 2 * r, E)
        dk_pad = jnp.zeros((B, h + 2 * r, w + 2 * r, E), jnp.float32)
        dv_pad = jnp.zeros((B, h + 2 * r, w + 2 * r, E), jnp.float32)
        for i in range(nb):
            dk_pad = dk_pad.at[:, i * h2:i * h2 + h2 + 2 * r].add(dkr[:, i])
            dv_pad = dv_pad.at[:, i * h2:i * h2 + h2 + 2 * r].add(dvr[:, i])
    dk = dk_pad[:, r:r + h, r:r + w, :].astype(k_img.dtype)
    dv = dv_pad[:, r:r + h, r:r + w, :].astype(v_img.dtype)
    return dq, dk, dv


windowed_attention.defvjp(_vjp_fwd, _vjp_bwd)


def local_attention_pallas_ad(qn, v, in_proj_weight, out_proj_weight,
                              num_heads: int, k: int = 5):
    """Differentiable fused local attention: same semantics as
    ops.attention.local_attention (q = k = qn normed, v raw)."""
    wq, wk, wv = jnp.split(in_proj_weight, 3, axis=0)
    out = windowed_attention(qn @ wq.T, qn @ wk.T, v @ wv.T, num_heads, k)
    return out @ out_proj_weight.T
