"""Block-diagonal angular attention on the MXU (Pallas TPU kernel).

The angular transformer is full MHSA over A^2 = 25 view tokens per pixel
(reference model/LFT.py:194-238) -- per-(pixel, head) score matrices of
25 x 25 with dh = 8. Neither XLA's batched matmul (pads 25 -> 128 on both
operand tiles) nor the key-sweep kernel (lft_tpu/kernels/ang_attn_vjp.py,
25 shifted VPU passes) uses the MXU well at this shape.

This kernel packs G pixels AND all heads into full-size MXU contractions
via head-masked key replication:

* pixels are first lane-packed in PAIRS (two pixels' tokens side by side:
  C 64 -> 128 channels, H 8 -> 16 blocked heads -- per-head attention is
  independent, so this is exact while filling all 128 vector lanes);
* a group = G = 128 // A2 packed pixels' tokens, q_g [G*A2 <= 128, C];
* K_rep [H*128, C]: row block h holds the group's keys with all channels
  outside head h zeroed (VMEM elementwise, no transposes), padded to a
  128-row block;
* scores = q_g @ K_rep^T: ONE [<=128, 128] x [128, H*128] MXU matmul
  computes every (pixel, head, query-view, key-view) score; a static
  block-diagonal mask removes p != p' cross-talk and the pad columns;
* softmax runs per 128-wide head block -- lane-tile-aligned slices, plain
  f32 max/exp/sum, no cross-head matmuls or relayouts;
* out = a @ V_rep: the head-masking of V_rep makes each output channel d
  pick up exactly its own head's attention rows.

Both contractions are [128, 128, 2048]-class MXU shapes. The custom VJP
reuses the same structure (standard dense-attention backward; dK/dV
de-replicated with the same head masks).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128  # per-head key-column block (lane-tile aligned)


def head_channel_masks(num_heads: int, C: int) -> np.ndarray:
    """HM [H, C]: row h is 1 on head h's dh-channel slice, 0 elsewhere.
    Shared by every head-packed kernel (here and spa_attn_hp.py)."""
    dh = C // num_heads
    HM = np.zeros((num_heads, C), np.float32)
    for h in range(num_heads):
        HM[h, h * dh:(h + 1) * dh] = 1.0
    return HM


@functools.lru_cache(maxsize=None)
def _consts(A2: int, C: int, num_heads: int, G: int):
    """Static (mask [G*A2, H*BLK], head channel masks HM [H, C])."""
    rows = G * A2
    r_pix = np.arange(rows) // A2                       # row -> pixel
    c_blk = np.arange(BLK)
    c_pix = np.where(c_blk < rows, c_blk // A2, -1)     # pad cols -> -1
    ok = (r_pix[:, None] == c_pix[None, :])             # [rows, BLK]
    mask_one = np.where(ok, 0.0, -1e30).astype(np.float32)
    mask = np.tile(mask_one, (1, num_heads))            # same per head block
    return mask, head_channel_masks(num_heads, C)


@functools.lru_cache(maxsize=None)
def _seg_bcast_matrix(num_blocks: int, blk_w: int) -> np.ndarray:
    """Seg [num_blocks, num_blocks*blk_w] 0/1: row b is 1 exactly on lane
    block b. `x [rows, num_blocks] @ Seg` broadcasts a per-(row, block)
    scalar across its lane block on the MXU -- the per-head normalizer /
    D-term broadcast used by the deferred-normalization softmax."""
    seg = np.zeros((num_blocks, num_blocks * blk_w), np.float32)
    for b in range(num_blocks):
        seg[b, b * blk_w:(b + 1) * blk_w] = 1.0
    return seg


def _seg_sums(x, num_blocks, blk_w):
    """[rows, num_blocks*blk_w] f32 -> [rows, num_blocks]: per-lane-block
    row sums (aligned 128-wide slice reductions, no relayout)."""
    return jnp.concatenate(
        [jnp.sum(x[:, b * blk_w:(b + 1) * blk_w], axis=-1, keepdims=True)
         for b in range(num_blocks)], axis=-1)


def _replicate(x, hm_ref, num_heads, rows):
    """[rows, C] -> [H*BLK, C]: block h = x * head_mask_h, zero-padded to
    BLK rows. One broadcast multiply (not H concats); the
    [H, BLK, C] -> [H*BLK, C] reshape is layout-free (row-major)."""
    C = x.shape[1]
    xp = jnp.concatenate(
        [x, jnp.zeros((BLK - rows, C), x.dtype)], axis=0)     # [BLK, C]
    hm = hm_ref[:, :].astype(x.dtype)                         # [H, C]
    rep = xp[None, :, :] * hm[:, None, :]
    return rep.reshape(num_heads * BLK, C)


GPS = int(os.environ.get("LFT_ANG_GPS", "8") or 8)
# groups per grid step: amortizes per-step DMA/bookkeeping; env override
# for A/B benchmarking


def _fwd_kernel(mask_ref, hm_ref, q_ref, k_ref, v_ref,
                o_ref, m_ref, l_ref, *, num_heads, with_stats):
    C = q_ref.shape[-1]
    rows = q_ref.shape[1]
    scale = jnp.float32(float(C // num_heads) ** -0.5)
    for g in range(q_ref.shape[0]):
        q_g = q_ref[g]
        k_rep = _replicate(k_ref[g], hm_ref, num_heads, rows)  # [H*BLK, C]
        v_rep = _replicate(v_ref[g], hm_ref, num_heads, rows)
        s = jax.lax.dot_general(
            q_g, k_rep, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [rows, H*BLK]
        s = s * scale + mask_ref[:, :]
        # Deferred-normalization row softmax: softmax is invariant to any
        # per-ROW shift applied across a whole head block, so ONE row-wide
        # max serves every head segment (exact; only the stored stats
        # change meaning). exp runs over the whole row; per-head
        # normalizers come from aligned segment sums; division is folded
        # in AFTER the value matmul -- the head-masked v_rep means output
        # channel d receives only head h(d)'s rows, so scaling column d by
        # 1/l_{h(d)} (one (1/l) @ HM broadcast matmul) is exact. Replaces
        # a `num_heads`-iteration loop of tiny max/exp/sum/div/concat ops
        # with 4 full-width ops (measured 7.9 -> 6.3 ms at the production
        # inference shape). All heads share one q/k scale, so per-head
        # maxes stay close to the row max and exp cannot underflow a
        # whole head segment in practice.
        m = jnp.max(s, axis=-1, keepdims=True)                # [rows, 1]
        e = jnp.exp(s - m)                                    # masked -> 0
        l = _seg_sums(e, num_heads, BLK)                      # [rows, H]
        out_raw = jax.lax.dot_general(
            e.astype(v_rep.dtype), v_rep,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [rows, C]
        inv = 1.0 / l
        out = out_raw * jnp.dot(inv, hm_ref[:, :].astype(jnp.float32),
                                preferred_element_type=jnp.float32)
        o_ref[g] = out.astype(o_ref.dtype)
        if with_stats:
            m_ref[g] = m + jnp.zeros((rows, num_heads), jnp.float32)
            l_ref[g] = l


def _bwd_kernel(mask_ref, hm_ref, seg_ref, q_ref, k_ref, v_ref, do_ref,
                m_ref, l_ref, dq_ref, dk_ref, dv_ref, *, num_heads):
    C = q_ref.shape[-1]
    rows = q_ref.shape[1]
    scale = jnp.float32(float(C // num_heads) ** -0.5)
    for g in range(q_ref.shape[0]):
        q_g = q_ref[g]
        do_g = do_ref[g]
        k_rep = _replicate(k_ref[g], hm_ref, num_heads, rows)
        v_rep = _replicate(v_ref[g], hm_ref, num_heads, rows)
        s = jax.lax.dot_general(
            q_g, k_rep, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + mask_ref[:, :]
        dov = jax.lax.dot_general(
            do_g, v_rep, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [rows, H*BLK]
        # whole-row recompute with Seg-broadcast stats (see the forward
        # kernel's note); the three [rows, H] @ Seg broadcasts are tiny
        # MXU matmuls replacing the per-head slice loop
        seg = seg_ref[:, :]                                   # [H, H*BLK]
        m_b = jnp.dot(m_ref[g], seg, preferred_element_type=jnp.float32)
        inv_b = jnp.dot(1.0 / l_ref[g], seg,
                        preferred_element_type=jnp.float32)
        a_f = jnp.exp(s - m_b) * inv_b                        # [rows, H*BLK]
        D = _seg_sums(a_f * dov, num_heads, BLK)              # [rows, H]
        D_b = jnp.dot(D, seg, preferred_element_type=jnp.float32)
        ds = (a_f * (dov - D_b) * scale).astype(q_g.dtype)
        a = a_f.astype(q_g.dtype)
        dq_ref[g] = jax.lax.dot_general(
            ds, k_rep, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_rep = jax.lax.dot_general(
            ds, q_g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [H*BLK, C]
        dv_rep = jax.lax.dot_general(
            a, do_g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk = jnp.zeros_like(dk_ref[g])
        dv = jnp.zeros_like(dv_ref[g])
        for h in range(num_heads):
            hm = hm_ref[h:h + 1, :]
            dk = dk + dk_rep[h * BLK:h * BLK + rows] * hm
            dv = dv + dv_rep[h * BLK:h * BLK + rows] * hm
        dk_ref[g] = dk.astype(dk_ref.dtype)
        dv_ref[g] = dv.astype(dv_ref.dtype)


def _prep_groups(x, A2, C, G):
    """[N, A2, C] -> ([n_groups, G*A2, C], N): N padded so the group count
    is a multiple of GPS (pad rows attend only to themselves; dropped on
    return)."""
    N = x.shape[0]
    pad = (-N) % (G * GPS)
    if pad:
        x = jnp.pad(x, [(0, pad), (0, 0), (0, 0)])
    return x.reshape((N + pad) // G, G * A2, C), N


def _specs(rows, C, num_heads):
    grp = pl.BlockSpec((GPS, rows, C), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    stath = pl.BlockSpec((GPS, rows, num_heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return grp, full, stath


def _fwd(q, k, v, num_heads, with_stats):
    N, A2, C = q.shape
    G = max(BLK // A2, 1)
    rows = G * A2
    mask, hm = (jnp.asarray(c) for c in _consts(A2, C, num_heads, G))
    hm = hm.astype(q.dtype)
    qg, _ = _prep_groups(q, A2, C, G)
    kg, _ = _prep_groups(k, A2, C, G)
    vg, _ = _prep_groups(v, A2, C, G)
    n_groups = qg.shape[0]
    grp, full, stath = _specs(rows, C, num_heads)
    interpret = jax.devices()[0].platform != "tpu"
    if not with_stats:
        # inference primal: no m/l outputs at all (declaring them would
        # stream two unused f32 [n_groups, rows, H] buffers to HBM per call)
        def kernel_nostats(mask_r, hm_r, q_r, k_r, v_r, o_r):
            _fwd_kernel(mask_r, hm_r, q_r, k_r, v_r, o_r, None, None,
                        num_heads=num_heads, with_stats=False)
        out = pl.pallas_call(
            kernel_nostats, interpret=interpret, grid=(n_groups // GPS,),
            in_specs=[full(rows, num_heads * BLK), full(num_heads, C),
                      grp, grp, grp],
            out_specs=grp,
            out_shape=jax.ShapeDtypeStruct((n_groups, rows, C), q.dtype),
        )(mask, hm, qg, kg, vg)
        return out.reshape(-1, A2, C)[:N], None, None
    kernel = functools.partial(_fwd_kernel, num_heads=num_heads,
                               with_stats=True)
    out, m, l = pl.pallas_call(
        kernel, interpret=interpret, grid=(n_groups // GPS,),
        in_specs=[full(rows, num_heads * BLK), full(num_heads, C),
                  grp, grp, grp],
        out_specs=(grp, stath, stath),
        out_shape=(jax.ShapeDtypeStruct((n_groups, rows, C), q.dtype),
                   jax.ShapeDtypeStruct((n_groups, rows, num_heads),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_groups, rows, num_heads),
                                        jnp.float32)),
    )(mask, hm, qg, kg, vg)
    return out.reshape(-1, A2, C)[:N], m, l


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ang_attention_blockdiag(q, k, v, num_heads: int):
    """Differentiable block-diagonal MXU attention over the view axis:
    [N, A2, C] projected q/k/v -> [N, A2, C]."""
    out, _, _ = _fwd(q, k, v, num_heads, with_stats=False)
    return out


def _vjp_fwd(q, k, v, num_heads):
    out, m, l = _fwd(q, k, v, num_heads, with_stats=True)
    return out, (q, k, v, m, l)


def _vjp_bwd(num_heads, res, dout):
    q, k, v, m, l = res
    N, A2, C = q.shape
    G = max(BLK // A2, 1)
    rows = G * A2
    mask, hm = (jnp.asarray(c) for c in _consts(A2, C, num_heads, G))
    seg = jnp.asarray(_seg_bcast_matrix(num_heads, BLK))
    from lft_tpu.kernels.common import bwd_io_dtype
    io_dtype = bwd_io_dtype(q.dtype)
    hm = hm.astype(io_dtype)
    qg, _ = _prep_groups(q.astype(io_dtype), A2, C, G)
    kg, _ = _prep_groups(k.astype(io_dtype), A2, C, G)
    vg, _ = _prep_groups(v.astype(io_dtype), A2, C, G)
    dog, _ = _prep_groups(dout.astype(io_dtype), A2, C, G)
    n_groups = qg.shape[0]
    grp, full, stath = _specs(rows, C, num_heads)
    interpret = jax.devices()[0].platform != "tpu"
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads)
    dq, dk, dv = pl.pallas_call(
        kernel, interpret=interpret, grid=(n_groups // GPS,),
        in_specs=[full(rows, num_heads * BLK), full(num_heads, C),
                  full(num_heads, num_heads * BLK),
                  grp, grp, grp, grp, stath, stath],
        out_specs=(grp, grp, grp),
        out_shape=(jax.ShapeDtypeStruct((n_groups, rows, C), io_dtype),
                   jax.ShapeDtypeStruct((n_groups, rows, C), jnp.float32),
                   jax.ShapeDtypeStruct((n_groups, rows, C), jnp.float32)),
    )(mask, hm, seg, qg, kg, vg, dog, m, l)
    tr = lambda x: x.reshape(-1, A2, C)[:N]
    return (tr(dq).astype(q.dtype), tr(dk).astype(k.dtype),
            tr(dv).astype(v.dtype))


ang_attention_blockdiag.defvjp(_vjp_fwd, _vjp_bwd)


def mxu_applicable(A2: int) -> bool:
    """The block-diag formulation needs one group's rows (G*A2, G >= 1) to
    fit the BLK=128 key block; A2 > BLK has no valid packing."""
    return A2 <= BLK


def ang_attention_mxu(qn, v, in_proj_weight, out_proj_weight,
                      num_heads: int):
    """Differentiable drop-in for the AngTrans MHSA (q = k = qn normed,
    v raw; torch-packed projections) on [..., A2, C] tokens. Requires
    `mxu_applicable(A2)`; callers fall back to the key-sweep kernel
    otherwise."""
    from lft_tpu.kernels.ang_attn_vjp import projected_pair_packed
    return projected_pair_packed(qn, v, in_proj_weight, out_proj_weight,
                                 num_heads, ang_attention_blockdiag)
