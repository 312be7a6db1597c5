"""Head-packed window-exact local spatial attention (Pallas, TPU).

Fourth-generation spatial attention kernel (reference semantics:
model/LFT.py:147-187 -- 5x5-window masked MHSA over h*w pixel tokens).
Like its predecessor it packs ALL heads into full-depth MXU contractions
with the head-masked key replication trick proven in
kernels/ang_attn_mxu.py -- but the geometry is no longer fixed to
(8, 16)-query tiles with a 256-row key block:

* `pick_hp_geometry` chooses the (th, tw) query tile and the per-head
  key block KB by a cost model CALIBRATED against v5e A/B runs.  Smaller
  tiles do strictly fewer MACs per view (each query pays for its whole
  tile halo x H, and the halo shrinks faster than the tile), but
  measured time is dominated by serialized per-tile-body work, so the
  MAC win does not cash out: at 32x32/E=128/H=8, (16, 4)/KB=160 does
  1.5x fewer lane-MACs than (8, 16)/KB=256 yet measures the same
  ~7.2-7.4 ms/op at the production chunk shape, and (8, 8)/KB=144
  (fewest MACs of the *128-row candidates) measures ~10.5 ms.  The
  model: 2 matmuls per tile when KB is lane-aligned else 3 (the segment
  sums become an H*KB-deep matmul, `_seg`), a 1.5x penalty for partial
  MXU output rows (nq < 128), and ~200K lane-MACs of fixed per-body
  overhead.  Production 32x32 resolves to (8, 16)/KB=256;
* KB only has to satisfy KB % 16 == 0 (sublane-tile alignment for the
  [H, KB, C] -> [H*KB, C] replication reshape) and H*KB % 128 == 0 --
  lane-UNALIGNED KB is supported via the `_seg` matmul segment sums --
  but the picker weighs both the exact and the 128-aligned KB for every
  tile because the aligned slice reductions are measurably cheaper than
  the segment-sum matmul;
* the window mask is SHARED by all tiles ([nq, H*KB], streamed in
  pre-replicated): out-of-image keys are handled by the zero-padded k/v
  halos plus a static per-(tile, query) pad-key count -- a zero-pad key
  inside the window scores exactly 0, so its softmax contribution is
  exp(-m) and the true denominator is l_raw - npad * exp(-m).  The
  value matmul is already exact (v pad rows are zero) and every pad-key
  gradient lands in the halo margins the caller crops, so forward AND
  backward stay exact with no per-tile mask tensors and no per-tile
  concat traffic;
* deferred-normalization row softmax throughout: one row-wide max/exp,
  per-head normalizers via the segment-sum matmul, divide folded in
  after the value matmul as a (1/l) @ HM broadcast
  (see kernels/ang_attn_mxu.py).

The FLOP count is still H x the minimal per-head formulation (the price
of full-depth contractions).  `LFT_HP_TILE=thxtw`, `LFT_HP_KB=n` and
`LFT_HP_VPS=v` override the geometry / key block / views-per-step for
A/B benchmarking (tools/bench_attn.py).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lft_tpu.kernels.ang_attn_mxu import _seg_bcast_matrix

# geometry limits: score rows per tile (MXU output tile), score width
# (VMEM for the [nq, H*KB] f32 intermediates), unrolled tile count
# (Mosaic compile time)
MAX_NQ = 128
MAX_WIDTH = 4096
MAX_TILES = 64
_M0 = 64  # modelled MXU row-fill floor: a matmul with m < _M0 rows costs
          # like m = _M0 (systolic fill latency)


def _divisors(n):
    return [d for d in range(1, n + 1) if n % d == 0]


def _kb_align(num_heads: int) -> int:
    """KB must keep H*KB % 128 == 0 (full lane tiles for the score array)
    and KB % 16 == 0 (sublane-tile-aligned replication reshape in bf16)."""
    g = np.gcd(num_heads, 128)
    return int(np.lcm(128 // g, 16))


@functools.lru_cache(maxsize=None)
def pick_hp_geometry(h: int, w: int, num_heads: int, k: int):
    """(th, tw, KB) minimising modelled MXU time
    `n_tiles * max(nq, _M0) * H*KB`, or None if no candidate fits the
    limits. `LFT_HP_TILE=thxtw` forces a tile (raises if invalid).

    A/B foot-gun: a forced tile WITHOUT `LFT_HP_KB` gets the minimal
    aligned KB, which may not be 128-lane aligned -- e.g. 8x16 forced
    gives KB=240 (22.6 MPx/s end-to-end) while the free search picks
    KB=256 (30.1 MPx/s; measured 2026-08-18). Set LFT_HP_KB explicitly
    when A/B-ing tiles, or the sweep measures KB alignment instead."""
    r = k // 2
    align = _kb_align(num_heads)

    kb_env = int(os.environ.get("LFT_HP_KB", "0") or 0)

    def build(th, tw, kb=None):
        if h % th or w % tw:
            return None
        nq = th * tw
        n_tiles = (h // th) * (w // tw)
        nk = (th + 2 * r) * (tw + 2 * r)
        KB = kb if kb is not None else -(-nk // align) * align
        if KB < nk or KB % align:
            return None
        if nq > MAX_NQ or n_tiles > MAX_TILES or num_heads * KB > MAX_WIDTH:
            return None
        return th, tw, KB

    env = os.environ.get("LFT_HP_TILE", "")
    if env:
        th, tw = (int(t) for t in env.lower().split("x"))
        got = build(th, tw, kb_env or None)
        if got is None:
            raise ValueError(
                f"LFT_HP_TILE={env} (LFT_HP_KB={kb_env}) invalid for "
                f"({h}, {w}) with num_heads={num_heads}, k={k}")
        return got

    def cost(th, tw, KB):
        """Modelled per-view MXU time, calibrated against v5e A/B runs
        (tools/bench_attn.py, see kernels/README.md): 2 full-width matmuls
        per tile when KB is lane-tile aligned, 3 when the per-head segment
        sums must run as an extra H*KB-deep matmul; tiles with partial
        MXU output rows (nq < 128) measured ~1.5x their MAC cost; ~200K
        lane-MAC-equivalents of fixed per-tile-body overhead (slicing,
        replication, exp -- serialized VPU work)."""
        nq = th * tw
        n_tiles = (h // th) * (w // tw)
        n_mm = 2 if KB % 128 == 0 else 3
        nq_eff = nq if nq >= 128 else nq * 1.5
        return n_tiles * (n_mm * nq_eff * num_heads * KB + 200_000)

    best, best_cost = None, None
    for th in _divisors(h):
        for tw in _divisors(w):
            nk = (th + 2 * r) * (tw + 2 * r)
            kb_exact = -(-nk // align) * align
            kb_alig = -(-nk // 128) * 128
            for kb in {kb_exact, kb_alig}:
                got = build(th, tw, kb)
                if got is None:
                    continue
                key = (cost(*got), (h // th) * (w // tw))
                if best_cost is None or key < best_cost:
                    best, best_cost = got, key
    return best


@functools.lru_cache(maxsize=None)
def _np_consts(th: int, tw: int, r: int, h: int, w: int, num_heads: int,
               C: int, KB: int):
    """Static kernel inputs:
    * mask_rep [nq, H*KB] f32: the tile-position-independent additive
      window mask (0 in the k x k window, -1e30 outside and on the
      nk..KB pad columns), pre-replicated across head blocks;
    * npad [n_tiles, nq, H] f32: per-(tile, query) count of in-window
      keys that fall outside the image (their zero-pad contribution,
      npad * exp(-m), is subtracted from the softmax denominator);
    * head channel masks HM [H, C]."""
    from lft_tpu.kernels.ang_attn_mxu import head_channel_masks
    hl_h, hl_w = th + 2 * r, tw + 2 * r
    nq, nk = th * tw, hl_h * hl_w
    qi = np.arange(nq)[:, None]
    ki = np.arange(nk)[None, :]
    q_y, q_x = qi // tw, qi % tw
    k_y, k_x = ki // hl_w - r, ki % hl_w - r
    in_win = (np.abs(q_y - k_y) <= r) & (np.abs(q_x - k_x) <= r)
    mask_one = np.full((nq, KB), -1e30, dtype=np.float32)
    mask_one[:, :nk] = np.where(in_win, 0.0, -1e30)
    mask_rep = np.tile(mask_one, (1, num_heads))
    npads = []
    for ti in range(h // th):
        for tj in range(w // tw):
            in_img = ((ti * th + k_y >= 0) & (ti * th + k_y < h)
                      & (tj * tw + k_x >= 0) & (tj * tw + k_x < w))
            npads.append((in_win & ~in_img).sum(axis=1))
    npad = np.asarray(npads, dtype=np.float32)          # [n_tiles, nq]
    npad = np.repeat(npad[:, :, None], num_heads, axis=2)
    return mask_rep, npad, head_channel_masks(num_heads, C)


@functools.lru_cache(maxsize=None)
def _np_segsum_matrix(num_heads: int, KB: int) -> np.ndarray:
    """SegT [H*KB, H] 0/1: `x [rows, H*KB] @ SegT` computes per-head-block
    row sums as one MXU matmul for lane-UNALIGNED KB (the aligned slice
    loop needs KB % 128 == 0). The matmul is H*KB deep -- noticeably more
    MXU time than aligned VPU slice reductions, so `_seg` only uses it
    when it must."""
    return _seg_bcast_matrix(num_heads, KB).T.copy()


def _seg(x, num_heads, KB, segt_ref, prec=None):
    """Per-head-block row sums [rows, H*KB] -> [rows, H]: aligned
    lane-tile slice reductions when KB allows, else the SegT matmul
    (`prec` = its MXU precision; the VPU slice-sum path is exact)."""
    if KB % 128 == 0:
        return jnp.concatenate(
            [jnp.sum(x[:, b * KB:(b + 1) * KB], axis=-1, keepdims=True)
             for b in range(num_heads)], axis=-1)
    return jnp.dot(x, segt_ref[:, :], preferred_element_type=jnp.float32,
                   precision=prec)


def _replicate(x_nk, hm_ref, num_heads, KB):
    """[nk, C] halo keys -> [H*KB, C] head-blocked, zero-padded rows.
    One broadcast multiply (not H concats): rep[h, i, c] = x[i, c] * HM[h, c];
    the [H, KB, C] -> [H*KB, C] reshape is layout-free (KB % 16 == 0 keeps
    it sublane-tile-aligned in bf16)."""
    nk, C = x_nk.shape
    xp = x_nk
    if KB > nk:
        xp = jnp.concatenate(
            [x_nk, jnp.zeros((KB - nk, C), x_nk.dtype)], axis=0)  # [KB, C]
    hm = hm_ref[:, :].astype(x_nk.dtype)                          # [H, C]
    rep = xp[None, :, :] * hm[:, None, :]
    return rep.reshape(num_heads * KB, C)


def _fwd_kernel(mask_ref, npad_ref, segt_ref, hm_ref, q_ref, k_ref, v_ref,
                o_ref, *, h, w, th, tw, r, KB, num_heads, with_stats=False,
                m_ref=None, l_ref=None):
    """One grid step = `V` view images. q_ref [V, h, w, E]; k_ref/v_ref
    [V, h+2r, w+2r, E] zero-padded; mask_ref [nq, H*KB] shared;
    npad_ref [n_tiles, nq, H]; segt_ref [H*KB, H]. With `with_stats`,
    also writes the per-(tile, query, head) softmax max and (corrected)
    denominator [V, n_tiles, nq, H] for the custom-VJP backward."""
    E = q_ref.shape[-1]
    hl_h, hl_w = th + 2 * r, tw + 2 * r
    nq, nk = th * tw, hl_h * hl_w
    scale = jnp.float32(float(E // num_heads) ** -0.5)

    for vi in range(q_ref.shape[0]):
        for ti in range(h // th):
            for tj in range(w // tw):
                q_t = q_ref[vi, ti * th:(ti + 1) * th,
                            tj * tw:(tj + 1) * tw, :]
                q_t = q_t.reshape(nq, E)
                k_t = k_ref[vi, ti * th:ti * th + hl_h,
                            tj * tw:tj * tw + hl_w, :]
                v_t = v_ref[vi, ti * th:ti * th + hl_h,
                            tj * tw:tj * tw + hl_w, :]
                k_rep = _replicate(k_t.reshape(nk, E), hm_ref, num_heads, KB)
                v_rep = _replicate(v_t.reshape(nk, E), hm_ref, num_heads, KB)
                t_idx = ti * (w // tw) + tj
                s = jax.lax.dot_general(
                    q_t, k_rep, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [nq, H*KB] MXU
                s = s * scale + mask_ref[:, :]
                # Deferred-normalization row softmax (see
                # kernels/ang_attn_mxu.py): one row-wide max is an exact
                # shift for every head segment; per-head normalizers from
                # the segment-sum matmul; the divide folds in after the
                # value matmul as a (1/l) @ HM broadcast.  In-window
                # zero-pad keys score exactly 0, so their denominator
                # contribution is npad * exp(-m) -- subtracted here, which
                # is what makes the shared (tile-independent) mask exact.
                m = jnp.max(s, axis=-1, keepdims=True)    # [nq, 1]
                e = jnp.exp(s - m)                        # masked -> 0
                l = _seg(e, num_heads, KB, segt_ref)      # [nq, H]
                l = l - jnp.exp(-m) * npad_ref[t_idx]
                out_raw = jax.lax.dot_general(
                    e.astype(v_rep.dtype), v_rep,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [nq, E] MXU
                o_t = out_raw * jnp.dot(
                    1.0 / l, hm_ref[:, :].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
                o_ref[vi, ti * th:(ti + 1) * th,
                      tj * tw:(tj + 1) * tw, :] = (
                    o_t.reshape(th, tw, E).astype(o_ref.dtype))
                if with_stats:
                    m_ref[vi, t_idx] = m + jnp.zeros((nq, num_heads),
                                                     jnp.float32)
                    l_ref[vi, t_idx] = l


def _bwd_kernel(mask_ref, segt_ref, seg_ref, hm_ref, q_ref, k_ref, v_ref,
                do_ref, m_ref, l_ref, dq_ref, dk_ref, dv_ref, *, h, w, th,
                tw, r, KB, num_heads):
    """Head-packed dense-attention backward, same tile structure: every
    matmul is a full-depth MXU contraction (standard identities; dk/dv
    de-replicated via the head masks and accumulated into PADDED
    [V, h+2r, w+2r, E] buffers -- tiles run sequentially, so the
    read-modify-write is safe).  Zero-pad keys need no correction here:
    their recomputed attention weight is nonzero, but it multiplies only
    zero v rows (the D term) or lands in dk/dv margin rows the caller
    crops -- see the module docstring."""
    E = q_ref.shape[-1]
    hl_h, hl_w = th + 2 * r, tw + 2 * r
    nq, nk = th * tw, hl_h * hl_w
    scale = jnp.float32(float(E // num_heads) ** -0.5)

    for vi in range(q_ref.shape[0]):
        dk_ref[vi] = jnp.zeros_like(dk_ref[vi])
        dv_ref[vi] = jnp.zeros_like(dv_ref[vi])
        for ti in range(h // th):
            for tj in range(w // tw):
                ysl = slice(ti * th, ti * th + hl_h)
                xsl = slice(tj * tw, tj * tw + hl_w)
                q_t = q_ref[vi, ti * th:(ti + 1) * th,
                            tj * tw:(tj + 1) * tw, :].reshape(nq, E)
                do_t = do_ref[vi, ti * th:(ti + 1) * th,
                              tj * tw:(tj + 1) * tw, :].reshape(nq, E)
                k_rep = _replicate(k_ref[vi, ysl, xsl, :].reshape(nk, E),
                                   hm_ref, num_heads, KB)
                v_rep = _replicate(v_ref[vi, ysl, xsl, :].reshape(nk, E),
                                   hm_ref, num_heads, KB)
                t_idx = ti * (w // tw) + tj
                m_t = m_ref[vi, t_idx]                    # [nq, H]
                l_t = l_ref[vi, t_idx]
                s = jax.lax.dot_general(
                    q_t, k_rep, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = s + mask_ref[:, :]
                dov = jax.lax.dot_general(
                    do_t, v_rep, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [nq, H*KB]
                # whole-row softmax recompute with Seg-broadcast stats
                # (see kernels/ang_attn_mxu.py's backward)
                seg = seg_ref[:, :]                       # [H, H*KB]
                m_b = jnp.dot(m_t, seg, preferred_element_type=jnp.float32)
                inv_b = jnp.dot(1.0 / l_t, seg,
                                preferred_element_type=jnp.float32)
                a_f = jnp.exp(s - m_b) * inv_b            # [nq, H*KB]
                D = _seg(a_f * dov, num_heads, KB, segt_ref)  # [nq, H]
                D_b = jnp.dot(D, seg, preferred_element_type=jnp.float32)
                ds = (a_f * (dov - D_b) * scale).astype(q_t.dtype)
                a = a_f.astype(q_t.dtype)
                dq_t = jax.lax.dot_general(
                    ds, k_rep, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [nq, E]
                dq_ref[vi, ti * th:(ti + 1) * th,
                       tj * tw:(tj + 1) * tw, :] = (
                    dq_t.reshape(th, tw, E).astype(dq_ref.dtype))
                dk_rep = jax.lax.dot_general(
                    ds, q_t, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [H*KB, E]
                dv_rep = jax.lax.dot_general(
                    a, do_t, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dk_t = jnp.zeros((nk, E), jnp.float32)
                dv_t = jnp.zeros((nk, E), jnp.float32)
                for hd in range(num_heads):
                    hmv = hm_ref[hd:hd + 1, :].astype(jnp.float32)
                    dk_t = dk_t + dk_rep[hd * KB:hd * KB + nk] * hmv
                    dv_t = dv_t + dv_rep[hd * KB:hd * KB + nk] * hmv
                dk_ref[vi, ysl, xsl, :] = (dk_ref[vi, ysl, xsl, :]
                                           + dk_t.reshape(hl_h, hl_w, E))
                dv_ref[vi, ysl, xsl, :] = (dv_ref[vi, ysl, xsl, :]
                                           + dv_t.reshape(hl_h, hl_w, E))


def _geom(h, w, E, k, B, V, num_heads):
    r = k // 2
    th, tw, KB = pick_hp_geometry(h, w, num_heads, k)
    n_tiles = (h // th) * (w // tw)
    nq = th * tw
    pad_b = (-B) % V
    img = pl.BlockSpec((V, h, w, E), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    pad = pl.BlockSpec((V, h + 2 * r, w + 2 * r, E), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((nq, num_heads * KB), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    npspec = pl.BlockSpec((n_tiles, nq, num_heads), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    segtspec = pl.BlockSpec((num_heads * KB, num_heads), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return r, th, tw, KB, n_tiles, nq, pad_b, img, pad, mspec, npspec, segtspec


def _views_per_step(n_tiles, with_stats):
    """Unrolled-body budget: V * n_tiles <= 32 bodies keeps Mosaic compile
    time and the scoped-VMEM stack in check (raising it to 64 measured
    SLOWER at every geometry tried and OOMed at V=8); stats mode carries
    extra f32 stat blocks, halve it. `LFT_HP_VPS=N` overrides for A/B
    benchmarking."""
    env = os.environ.get("LFT_HP_VPS", "")
    if env:
        return int(env)
    v = max(1, 32 // n_tiles)
    return max(1, v // 2) if with_stats else v


def _pad_views(x, pad_b, r=0):
    if pad_b:
        x = jnp.pad(x, [(0, pad_b), (0, 0), (0, 0), (0, 0)])
    if r:
        x = jnp.pad(x, [(0, 0), (r, r), (r, r), (0, 0)])
    return x


def _fwd(q_img, k_img, v_img, num_heads, k, with_stats,
         views_per_step=None):
    B, h, w, E = q_img.shape
    (r, th, tw, KB, n_tiles, nq, _, _, _, _, _, _) = _geom(
        h, w, E, k, B, 1, num_heads)
    V = views_per_step or _views_per_step(n_tiles, with_stats)
    (r, th, tw, KB, n_tiles, nq, pad_b, img, pad, mspec, npspec,
     segtspec) = _geom(h, w, E, k, B, V, num_heads)
    mask, npad, hm = (jnp.asarray(c) for c in
                      _np_consts(th, tw, r, h, w, num_heads, E, KB))
    segt = jnp.asarray(_np_segsum_matrix(num_heads, KB))
    hm = hm.astype(q_img.dtype)
    q_p = _pad_views(q_img, pad_b)
    kp = _pad_views(k_img, pad_b, r)
    vp = _pad_views(v_img, pad_b, r)
    hspec = pl.BlockSpec((num_heads, E), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    interpret = jax.devices()[0].platform != "tpu"
    Bp = B + pad_b
    if not with_stats:
        kernel = functools.partial(_fwd_kernel, h=h, w=w, th=th, tw=tw, r=r,
                                   KB=KB, num_heads=num_heads,
                                   with_stats=False)
        out = pl.pallas_call(
            kernel, interpret=interpret, grid=(Bp // V,),
            in_specs=[mspec, npspec, segtspec, hspec, img, pad, pad],
            out_specs=img,
            out_shape=jax.ShapeDtypeStruct((Bp, h, w, E), q_img.dtype),
        )(mask, npad, segt, hm, q_p, kp, vp)
        return out[:B], None, None
    stat = pl.BlockSpec((V, n_tiles, nq, num_heads),
                        lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    def kernel_stats(mm, np_, st, hh, q, kk, vv, o, m, l):
        _fwd_kernel(mm, np_, st, hh, q, kk, vv, o, h=h, w=w, th=th, tw=tw,
                    r=r, KB=KB, num_heads=num_heads, with_stats=True,
                    m_ref=m, l_ref=l)
    out, m, l = pl.pallas_call(
        kernel_stats, interpret=interpret, grid=(Bp // V,),
        in_specs=[mspec, npspec, segtspec, hspec, img, pad, pad],
        out_specs=(img, stat, stat),
        out_shape=(jax.ShapeDtypeStruct((Bp, h, w, E), q_img.dtype),
                   jax.ShapeDtypeStruct((Bp, n_tiles, nq, num_heads),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((Bp, n_tiles, nq, num_heads),
                                        jnp.float32)),
    )(mask, npad, segt, hm, q_p, kp, vp)
    return out[:B], m[:B], l[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def windowed_attention_headpacked(q_img, k_img, v_img, num_heads: int,
                                  k: int):
    """Differentiable head-packed windowed attention on [B, h, w, E]
    projected q/k/v (window k x k). Requires a valid
    `pick_hp_geometry(h, w, num_heads, k)` and E % num_heads == 0 (see
    `headpacked_applicable`). Several views are processed per grid step
    to amortize per-step DMA setup (B is padded to a multiple; pad views
    are dropped on return)."""
    out, _, _ = _fwd(q_img, k_img, v_img, num_heads, k, with_stats=False)
    return out


def _vjp_fwd(q_img, k_img, v_img, num_heads, k):
    out, m, l = _fwd(q_img, k_img, v_img, num_heads, k, with_stats=True)
    return out, (q_img, k_img, v_img, m, l)


def _vjp_bwd(num_heads, k, res, dout):
    q_img, k_img, v_img, m, l = res
    B, h, w, E = q_img.shape
    # Backward holds f32 dk/dv accumulators + full-width scratch per tile;
    # one view per step is the only setting that fits the 16 MB scoped-VMEM
    # stack (V=2/4 still fail to compile at the current 8x16/KB=256
    # geometry -- 2026-08-19 tools/bench_train_knobs.py sweep).
    # `LFT_HP_BWD_VPS=N` overrides for A/B benchmarking.
    V = int(os.environ.get("LFT_HP_BWD_VPS", "1") or 1)
    (r, th, tw, KB, n_tiles, nq, pad_b, img, pad, mspec, npspec,
     segtspec) = _geom(h, w, E, k, B, V, num_heads)
    mask, npad, hm = (jnp.asarray(c) for c in
                      _np_consts(th, tw, r, h, w, num_heads, E, KB))
    segt = jnp.asarray(_np_segsum_matrix(num_heads, KB))
    seg = jnp.asarray(_seg_bcast_matrix(num_heads, KB))
    from lft_tpu.kernels.common import bwd_io_dtype
    io_dtype = bwd_io_dtype(q_img.dtype)
    # Assert-don't-assume the dispatch invariant (common.py:bwd_io_dtype):
    # this backward's f32 form overflows the 16 MB scoped-VMEM stack on
    # real TPUs -- f32 runs must be routed to the tile-dense pair
    # (spa_attn.py:_use_headpacked_pair). A new dispatch path that forgot
    # the pairing would otherwise fail as an inscrutable Mosaic OOM, or
    # worse, tempt a silent bf16 downgrade of f32 gradients.
    if jax.devices()[0].platform == "tpu" and io_dtype != jnp.bfloat16:
        raise AssertionError(
            "head-packed spatial backward requires bf16 I/O on TPU; the "
            "dispatcher must pick the tile-dense pair for f32 runs")
    hm = hm.astype(io_dtype)
    q_p = _pad_views(q_img.astype(io_dtype), pad_b)
    kp = _pad_views(k_img.astype(io_dtype), pad_b, r)
    vp = _pad_views(v_img.astype(io_dtype), pad_b, r)
    do_p = _pad_views(dout.astype(io_dtype), pad_b)
    # (statically dead at V=1 since pad_b == 0, but kept live-by-derivation:
    # if V is ever raised, pad views need stats too -- denominator 1 avoids
    # exp(x)/0 on them; their grads are dropped on return)
    spad = [(0, pad_b), (0, 0), (0, 0), (0, 0)]
    m_p = jnp.pad(m, spad) if pad_b else m
    l_p = jnp.pad(l, spad) if pad_b else l
    if pad_b:
        l_p = l_p.at[B:].set(1.0)
    hspec = pl.BlockSpec((num_heads, E), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((V, n_tiles, nq, num_heads),
                        lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    interpret = jax.devices()[0].platform != "tpu"
    Bp = B + pad_b
    kernel = functools.partial(_bwd_kernel, h=h, w=w, th=th, tw=tw, r=r,
                               KB=KB, num_heads=num_heads)
    segspec = pl.BlockSpec((num_heads, num_heads * KB), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    dq, dk_pad, dv_pad = pl.pallas_call(
        kernel, interpret=interpret, grid=(Bp // V,),
        in_specs=[mspec, segtspec, segspec, hspec, img, pad, pad, img,
                  stat, stat],
        out_specs=(img, pad, pad),
        out_shape=(jax.ShapeDtypeStruct((Bp, h, w, E), q_img.dtype),
                   jax.ShapeDtypeStruct((Bp, h + 2 * r, w + 2 * r, E),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((Bp, h + 2 * r, w + 2 * r, E),
                                        jnp.float32)),
    )(mask, segt, seg, hm, q_p, kp, vp, do_p, m_p, l_p)
    dk = dk_pad[:B, r:r + h, r:r + w, :].astype(k_img.dtype)
    dv = dv_pad[:B, r:r + h, r:r + w, :].astype(v_img.dtype)
    return dq[:B], dk, dv


windowed_attention_headpacked.defvjp(_vjp_fwd, _vjp_bwd)


def headpacked_applicable(h: int, w: int, E: int, num_heads: int,
                          k: int) -> bool:
    if E % num_heads:
        return False
    return pick_hp_geometry(h, w, num_heads, k) is not None
