"""LFT: Light Field Transformer for LF image super-resolution, TPU-native.

Functional re-design of the reference model (reference model/LFT.py:8-266):
alternating angular transformers (full MHSA over the A^2 view tokens) and
spatial transformers (local-window MHSA over the h*w pixel tokens) on top of
a 3x3-conv feature extractor, with pixel-shuffle upsampling and a per-view
torch-bicubic skip connection.

Design departures from the reference (same math, TPU-first execution):

* Pure function over a flat param dict; all the reference's side-channel
  state injection (`for m in self.modules(): m.h = ...`, model/LFT.py:60-73)
  becomes explicit static shape information at trace time.
* The spatial transformer's dense O((hw)^2) attention mask
  (model/LFT.py:147-162) is replaced by exact tiled halo attention
  (lft_tpu/ops/attention.py) -- ~7x fewer attention FLOPs at 32x32.
* `unfold(3x3) + Linear` tokenization (model/LFT.py:164-169) runs as a
  single 3x3 conv (lft_tpu/ops/unfold.py).
* Per-view Conv3d(1,3,3) stacks run as 2-D convs with the A^2 view axis
  folded into the batch.
* The bicubic skip (model/LFT.py:255-266) is two static resize matmuls.

Parameters are stored with the reference's exact state_dict names and
layouts (e.g. `conv_init0.0.weight`, `altblock.0.ang_trans.attention.
in_proj_weight`, `upsampling.3.weight`), so `.pth` checkpoints convert by
dtype-cast only (lft_tpu/utils/checkpoint.py).

Quirks intentionally preserved (parity-critical):
* asymmetric pre-norm: q = k = LayerNorm(token + PE), v = RAW token
  (model/LFT.py:183-187, 230-233);
* the spatial PE passes through the SAME unfold+MLP as the tokens, per block
  (model/LFT.py:180);
* no biases in any conv/linear/attention; LayerNorms keep affine params;
* the final 3x3 conv operates on the full SAI mosaic and crosses view
  borders (model/LFT.py:43,80);
* dropout = 0 everywhere (model/LFT.py:20).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from lft_tpu.ops.attention import local_attention, multi_head_attention
from lft_tpu.ops.bicubic import bicubic_upscale_views
from lft_tpu.ops.posenc import angular_position, spatial_position
from lft_tpu.ops.unfold import conv2d_nhwc, unfold3x3_linear
from lft_tpu.registry import ModelDef, register_model

LAYER_NUM = 4      # reference model/LFT.py:15
NUM_HEADS = 8      # reference model/LFT.py:19
KERNEL_FIELD = 3   # reference model/LFT.py:122
KERNEL_SEARCH = 5  # reference model/LFT.py:123
LN_EPS = 1e-5      # torch nn.LayerNorm default


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def param_shapes(channels: int, scale: int) -> Dict[str, tuple]:
    """Torch state_dict name -> shape (torch layouts), mirroring
    reference model/LFT.py:23-44,118-214."""
    C = channels
    shapes: Dict[str, tuple] = {
        "conv_init0.0.weight": (C, 1, 1, 3, 3),
        "conv_init.0.weight": (C, C, 1, 3, 3),
        "conv_init.2.weight": (C, C, 1, 3, 3),
        "conv_init.4.weight": (C, C, 1, 3, 3),
    }
    for i in range(LAYER_NUM):
        a = f"altblock.{i}.ang_trans."
        shapes[a + "norm.weight"] = (C,)
        shapes[a + "norm.bias"] = (C,)
        shapes[a + "attention.in_proj_weight"] = (3 * C, C)
        shapes[a + "attention.out_proj.weight"] = (C, C)
        shapes[a + "feed_forward.0.weight"] = (C,)
        shapes[a + "feed_forward.0.bias"] = (C,)
        shapes[a + "feed_forward.1.weight"] = (2 * C, C)
        shapes[a + "feed_forward.4.weight"] = (C, 2 * C)
        s = f"altblock.{i}.spa_trans."
        D = 2 * C  # spa_dim (reference model/LFT.py:124)
        shapes[s + "MLP.weight"] = (D, C * KERNEL_FIELD ** 2)
        shapes[s + "norm.weight"] = (D,)
        shapes[s + "norm.bias"] = (D,)
        shapes[s + "attention.in_proj_weight"] = (3 * D, D)
        shapes[s + "attention.out_proj.weight"] = (D, D)
        shapes[s + "feed_forward.0.weight"] = (D,)
        shapes[s + "feed_forward.0.bias"] = (D,)
        shapes[s + "feed_forward.1.weight"] = (2 * D, D)
        shapes[s + "feed_forward.4.weight"] = (D, 2 * D)
        shapes[s + "linear.0.weight"] = (C, D, 1, 1, 1)
    shapes["upsampling.0.weight"] = (C * scale ** 2, C, 1, 1)
    shapes["upsampling.3.weight"] = (1, C, 3, 3)
    return shapes


def _fan_in(name: str, shape: tuple) -> int:
    if name.endswith("norm.weight") or name.endswith("norm.bias") \
            or "feed_forward.0." in name:
        return 0  # LayerNorm affine: weight=1, bias=0
    # conv: in_ch * prod(kernel); linear/attention: in features
    if len(shape) >= 3:
        fan = shape[1]
        for d in shape[2:]:
            fan *= d
        return fan
    return shape[1]


def init_params(rng: jax.Array, args) -> Dict[str, jnp.ndarray]:
    """Initialize with torch's effective scheme: every weight tensor in this
    model ends up `kaiming_uniform_(a=sqrt(5))` = U(+-1/sqrt(fan_in))
    (torch defaults for Conv/Linear; the reference explicitly applies the
    same to attention in_proj, model/LFT.py:132,204); LayerNorm affine is
    (1, 0). The reference's `weights_init` itself is a no-op
    (model/LFT.py:280-282)."""
    shapes = param_shapes(args.channels, args.scale_factor)
    params = {}
    keys = jax.random.split(rng, len(shapes))
    for key, (name, shape) in zip(keys, sorted(shapes.items())):
        fan = _fan_in(name, shape)
        if fan == 0:
            val = jnp.zeros(shape, jnp.float32) if name.endswith("bias") \
                else jnp.ones(shape, jnp.float32)
        else:
            bound = 1.0 / math.sqrt(fan)
            val = jax.random.uniform(key, shape, jnp.float32, -bound, bound)
        params[name] = val
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + LN_EPS)
    return xn * weight + bias


def _leaky(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def _conv3d_133(x: jnp.ndarray, w_torch: jnp.ndarray) -> jnp.ndarray:
    """Per-view 3x3 conv: torch Conv3d k=(1,3,3) weight [O, I, 1, 3, 3]
    applied to [B*A2, h, w, I] (view axis folded into batch)."""
    return conv2d_nhwc(x, w_torch[:, :, 0], padding="SAME")


def _ffn(x: jnp.ndarray, p: Dict[str, jnp.ndarray], prefix: str) -> jnp.ndarray:
    """LN -> Linear(d->2d) -> ReLU -> Linear(2d->d), dropout=0
    (reference model/LFT.py:135-142, 207-214)."""
    y = _layer_norm(x, p[prefix + "feed_forward.0.weight"],
                    p[prefix + "feed_forward.0.bias"])
    y = y @ p[prefix + "feed_forward.1.weight"].T
    y = jax.nn.relu(y)
    y = y @ p[prefix + "feed_forward.4.weight"].T
    return y


def _ang_trans(x: jnp.ndarray, p: Dict[str, jnp.ndarray], prefix: str,
               ang_pe: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """Angular transformer over [B, A2, h, w, C]
    (reference model/LFT.py:194-238)."""
    B, A2, h, w, C = x.shape
    t = x.transpose(0, 2, 3, 1, 4)                     # [B, h, w, A2, C]
    tn = _layer_norm(t + ang_pe.astype(t.dtype),
                     p[prefix + "norm.weight"], p[prefix + "norm.bias"])
    if impl == "pallas" or (impl == "auto"
                            and jax.devices()[0].platform == "tpu"):
        from lft_tpu.kernels.ang_attn import ang_attention_pallas
        attn = ang_attention_pallas(tn, t,
                                    p[prefix + "attention.in_proj_weight"],
                                    p[prefix + "attention.out_proj.weight"],
                                    NUM_HEADS)
    else:
        attn = multi_head_attention(tn, tn, t,
                                    p[prefix + "attention.in_proj_weight"],
                                    p[prefix + "attention.out_proj.weight"],
                                    NUM_HEADS)
    t = attn + t
    t = _ffn(t, p, prefix) + t
    return t.transpose(0, 3, 1, 2, 4)                  # [B, A2, h, w, C]


def _spa_trans(x: jnp.ndarray, p: Dict[str, jnp.ndarray], prefix: str,
               spa_pe: jnp.ndarray, impl: str,
               fused: bool = False, mm_half: bool = False) -> jnp.ndarray:
    """Spatial transformer over [B, A2, h, w, C]
    (reference model/LFT.py:118-191).

    `fused=True` runs the whole block -- unfold conv, PE add, LayerNorm,
    projections, windowed attention, residuals, FFN, Token2SAI -- as ONE
    Pallas kernel (kernels/spa_block.py); differentiable via its fused
    recompute+backward custom VJP. `mm_half=True` keeps the block's
    activations/residuals/softmax in the IO dtype (f32 in the shipping
    `--dtype mixed` config) while matmul operands are cast to bf16."""
    B, A2, h, w, C = x.shape
    img = x.reshape(B * A2, h, w, C)
    if fused:
        from lft_tpu.kernels.spa_block import spa_trans_block_fused
        pe_tok = unfold3x3_linear(spa_pe[None].astype(img.dtype),
                                  p[prefix + "MLP.weight"])[0]
        out = spa_trans_block_fused(img, pe_tok, p, prefix,
                                    NUM_HEADS, KERNEL_SEARCH,
                                    mm_half=mm_half)
        return out.reshape(B, A2, h, w, C)
    tok = unfold3x3_linear(img, p[prefix + "MLP.weight"])        # [B*A2, h, w, 2C]
    pe_tok = unfold3x3_linear(spa_pe[None].astype(img.dtype),
                              p[prefix + "MLP.weight"])           # [1, h, w, 2C]
    tok_n = _layer_norm(tok + pe_tok,
                        p[prefix + "norm.weight"], p[prefix + "norm.bias"])
    attn = local_attention(tok_n, tok,
                           p[prefix + "attention.in_proj_weight"],
                           p[prefix + "attention.out_proj.weight"],
                           NUM_HEADS, k=KERNEL_SEARCH, impl=impl)
    tok = attn + tok
    tok = _ffn(tok, p, prefix) + tok
    # Token2SAI: 1x1x1 conv spa_dim -> C (reference model/LFT.py:143-145,171-174)
    out = tok @ p[prefix + "linear.0.weight"][:, :, 0, 0, 0].T
    return out.reshape(B, A2, h, w, C)


def _pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch nn.PixelShuffle on NHWC: [B, H, W, C*r^2] -> [B, H*r, W*r, C],
    channel index c*r^2 + i*r + j -> output (c, h*r+i, w*r+j)."""
    B, H, W, Cr2 = x.shape
    C = Cr2 // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)                  # [B, H, i, W, j, C]
    return x.reshape(B, H * r, W * r, C)


def forward(params: Dict[str, jnp.ndarray], lr: jnp.ndarray, args,
            attention_impl: str = None, dtype=None,
            remat: bool = True, fused: bool = False) -> jnp.ndarray:
    """SR forward: lr [B, 1, A*h, A*w] (NCHW, like the reference) ->
    [B, 1, A*h*S, A*w*S]. Pure and jit/vmap/shard_map-friendly; all shape-
    dependent state (PEs, masks, resize matrices) is static at trace time.

    `remat=True` (training default) checkpoints each AltFilter block.
    Inference passes remat=False: besides being useless without a backward,
    a checkpoint region inside the tiled pipeline's `lax.map` makes XLA
    stack-allocate the attention kernels' outputs in scoped VMEM, which
    overflows the 16 MB budget for small-channel configs on real TPUs.

    `fused=True` runs each whole transformer block as one Pallas kernel
    (kernels/{spa,ang}_block.py) where the geometry allows; the
    tiled-inference pipeline enables it on real TPUs, and the trainer
    enables it for bf16 TPU training (the blocks carry fused
    recompute+backward custom VJPs, so remat is redundant with it)."""
    A = args.angRes
    S = args.scale_factor
    C = args.channels
    impl = attention_impl or getattr(args, "attention_impl", "auto") or "auto"
    dt = str(dtype or getattr(args, "dtype", "float32") or "float32")
    # "mixed": the shipping TPU precision mode -- f32 activations, residual
    # stream, LayerNorms and softmax (no bf16 cast noise accumulating over
    # the 8 transformer blocks, which measured -0.20 dB PSNR in the all-bf16
    # config, PARITY_bf16.json r4), with a PER-SITE matmul plan inside the
    # fused block kernels (kernels/common.mm_site_plan: f32/HIGHEST for the
    # hp sites, bf16 single-pass for the rest).
    mm_half = dt == "mixed"
    compute_dtype = jnp.float32 if mm_half else jnp.dtype(dt)
    prec = getattr(args, "matmul_precision", "default")
    if mm_half and (not prec or prec == "default"):
        # XLA's DEFAULT f32 matmul/conv on TPU rounds operands to bf16 --
        # the conv stack, upsampler head and bicubic skip would silently
        # undo the kernels' precision plan (the skip adds straight into
        # the SR output). The XLA side is a small slice of the pipeline
        # (docs/PERFORMANCE.md), so 'highest' there is nearly free.
        prec = "highest"
    if prec and prec != "default":
        # trace the whole forward under the requested matmul precision
        # ('highest' => f32-exact parity mode; 'default' inherits ambient)
        with jax.default_matmul_precision(prec):
            return _forward_body(params, lr, args, impl, compute_dtype,
                                 remat, fused, mm_half)
    return _forward_body(params, lr, args, impl, compute_dtype, remat, fused,
                         mm_half)


def _forward_body(params, lr, args, impl, compute_dtype, remat=True,
                  fused=False, mm_half=False):
    A = args.angRes
    S = args.scale_factor
    C = args.channels

    B, _, H, W = lr.shape
    h, w = H // A, W // A

    # bicubic per-view skip path (reference model/LFT.py:54, 255-266);
    # computed in f32 for fidelity regardless of compute dtype
    lr_up = bicubic_upscale_views(lr[:, 0].astype(jnp.float32), A, S)[:, None]

    p = {k: v.astype(compute_dtype) for k, v in params.items()}
    x = lr[:, 0].astype(compute_dtype)                                # [B, H, W]
    x = x.reshape(B, A, h, A, w).transpose(0, 1, 3, 2, 4)
    x = x.reshape(B * A * A, h, w, 1)                                 # views NHWC

    # initial conv stack (reference model/LFT.py:23-33, 65-66)
    x0 = _conv3d_133(x, p["conv_init0.0.weight"])
    y = _leaky(_conv3d_133(x0, p["conv_init.0.weight"]))
    y = _leaky(_conv3d_133(y, p["conv_init.2.weight"]))
    y = _leaky(_conv3d_133(y, p["conv_init.4.weight"]))
    buf = y + x0                                                      # [B*A2, h, w, C]

    # position encodings (reference model/LFT.py:69-70, 86-115)
    spa_pe = jnp.asarray(spatial_position(h, w, C))                   # [h, w, C]
    ang_pe = jnp.asarray(angular_position(A * A, C))                  # [A2, C]

    buf = buf.reshape(B, A * A, h, w, C)
    res = buf

    if fused:
        from lft_tpu.kernels.ang_block import ang_block_applicable
        from lft_tpu.kernels.spa_block import spa_block_applicable
        fused = (spa_block_applicable(h, w, 2 * C, NUM_HEADS, KERNEL_SEARCH)
                 and ang_block_applicable(A * A))

    if fused:
        # fused fast path (inference AND bf16 training): both transformer
        # halves of every AltFilter run as single Pallas kernels (with
        # fused recompute+backward custom VJPs). The angular kernel consumes
        # pixel-major [N, A2, C] tokens (its pixel groups are contiguous
        # rows there); the surrounding transposes are the SAME two the
        # unfused _ang_trans pays, so this strictly removes the XLA-side
        # LayerNorm/projection/pack/FFN passes.
        from lft_tpu.kernels.ang_block import ang_trans_block_fused
        from lft_tpu.kernels.spa_block import spa_trans_block_fused
        for i in range(LAYER_NUM):
            t = buf.transpose(0, 2, 3, 1, 4)         # [B, h, w, A2, C]
            t = ang_trans_block_fused(
                t.reshape(B * h * w, A * A, C), ang_pe, p,
                f"altblock.{i}.ang_trans.", NUM_HEADS, mm_half=mm_half)
            t = t.reshape(B, h, w, A * A, C).transpose(0, 3, 1, 2, 4)
            s_pref = f"altblock.{i}.spa_trans."
            pe_tok = unfold3x3_linear(spa_pe[None].astype(compute_dtype),
                                      p[s_pref + "MLP.weight"])[0]
            out = spa_trans_block_fused(
                t.reshape(B * A * A, h, w, C), pe_tok, p, s_pref,
                NUM_HEADS, KERNEL_SEARCH, mm_half=mm_half)
            buf = out.reshape(B, A * A, h, w, C)
        buf = buf + res                              # model/LFT.py:76
        # views -> mosaic (reference model/LFT.py:79)
        m = buf.reshape(B, A, A, h, w, C).transpose(0, 1, 3, 2, 4, 5)
        m = m.reshape(B, A * h, A * w, C)
    else:
        def _alt_block(buf, p, prefix_i):
            buf = _ang_trans(buf, p, f"altblock.{prefix_i}.ang_trans.",
                             ang_pe, impl)
            buf = _spa_trans(buf, p, f"altblock.{prefix_i}.spa_trans.",
                             spa_pe, impl)
            return buf

        for i in range(LAYER_NUM):                                    # 4x AltFilter
            # remat each block: with XLA attention the saved [.., 64, 144] /
            # [.., 25, 25] score activations of 4 blocks OOM HBM at the
            # reference's training batch sizes; recomputing them in backward
            # costs far less than it saves (SURVEY-scale model, cheap forward)
            blk = functools.partial(_alt_block, prefix_i=i)
            if remat:
                blk = jax.checkpoint(blk)
            buf = blk(buf, p)
        buf = buf + res                                               # model/LFT.py:76

        # views -> mosaic (reference model/LFT.py:79)
        m = buf.reshape(B, A, A, h, w, C).transpose(0, 1, 3, 2, 4, 5)
        m = m.reshape(B, A * h, A * w, C)

    # upsampling head (reference model/LFT.py:39-44, 80): 1x1 conv -> pixel
    # shuffle -> LeakyReLU -> mosaic-level 3x3 conv (crosses view borders).
    # TPU formulation: the 1x1 conv + pixel shuffle are one non-overlapping
    # stride-S transposed conv (kernel [S, S, Cin, C] with both spatial axes
    # flipped -- exactly pixel-shuffle's subpixel layout, verified bit-exact)
    # -- XLA lowers this far better than the 6-d shuffle transpose; and the
    # 3x3 conv to ONE output channel (which starves the MXU) becomes a
    # 9-tap channel contraction plus shifted adds.
    w_up = p["upsampling.0.weight"][:, :, 0, 0]                       # [C*S^2, C]
    w3 = p["upsampling.3.weight"]                                     # [1, C, 3, 3]
    ups_variant = os.environ.get("LFT_UPS_VARIANT", "fold")
    if ups_variant not in ("fold", "ct"):
        raise ValueError(f"unknown upsampler variant {ups_variant!r} "
                         f"(LFT_UPS_VARIANT?); valid: ('fold', 'ct')")
    if ups_variant == "fold":
        # LR-space formulation: never materialize narrow-channel HR
        # tensors (the HR 9-tap einsum has a 9-lane output and the
        # 1-channel shifted adds starve the VPU lanes; measured ~25
        # ms/scene). Instead:
        #   U  = leaky(m @ w_up^T)            [B, h, w, S^2*C]  (MXU, wide)
        #   T  = U @ Wfold                    [B, h, w, 9*S^2]  (MXU, wide)
        #   out[y, x, (i, j)] = sum_s Tp[y+dy, x+dx, s*S^2 + i*S + j]
        # where Wfold scatters w3's taps so column (s=(dy*3+dx), i, j)
        # of T holds the partial conv sum contributed by LR cell
        # (y+dy-1, x+dx-1) to HR pixel (S*y+i, S*x+j); the 9 shifted
        # adds then run on an S^2-wide LR grid, and a pixel-shuffle
        # reshape emits the HR mosaic. Bit-level semantics match the
        # conv_transpose path (same taps, f32 MXU accumulation).
        S2 = S * S
        r_np, c_np, k_np = [], [], []
        for i in range(S):
            for j in range(S):
                for ky in range(3):
                    for kx in range(3):
                        cy, ip = divmod(i + ky - 1, S)
                        cx, jp = divmod(j + kx - 1, S)
                        s9 = (cy + 1) * 3 + (cx + 1)
                        for c in range(C):
                            r_np.append(c * S2 + ip * S + jp)
                            c_np.append(s9 * S2 + i * S + j)
                            k_np.append(c * 9 + ky * 3 + kx)
        wfold = jnp.zeros((C * S2, 9 * S2), w3.dtype).at[
            jnp.asarray(r_np), jnp.asarray(c_np)].set(
                w3.reshape(-1)[jnp.asarray(k_np)]).astype(m.dtype)
        u = _leaky(m @ w_up.T.astype(m.dtype))                        # [B,h,w,S2*C]
        t = u @ wfold                                                 # [B,h,w,9*S2]
        tp = jnp.pad(t, [(0, 0), (1, 1), (1, 1), (0, 0)])
        hm, wm = m.shape[1], m.shape[2]
        o16 = sum(tp[:, dy:dy + hm, dx:dx + wm,
                     (dy * 3 + dx) * S2:(dy * 3 + dx + 1) * S2]
                  for dy in range(3) for dx in range(3))              # [B,h,w,S2]
        m = o16.reshape(B, hm, wm, S, S).transpose(0, 1, 3, 2, 4)
        m = m.reshape(B, hm * S, wm * S)[..., None]                   # [B,HS,WS,1]
    else:
        # conv_transpose formulation (kept for A/B: LFT_UPS_VARIANT=ct)
        w_t = w_up.reshape(C, S, S, C).transpose(1, 2, 3, 0)[::-1, ::-1]
        m = jax.lax.conv_transpose(m, w_t, strides=(S, S), padding="VALID",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
        m = _leaky(m)
        w9 = w3[0].transpose(1, 2, 0).reshape(9, C)                   # tap-major
        z = jnp.einsum("bhwc,tc->bhwt", m, w9)
        zp = jnp.pad(z, [(0, 0), (1, 1), (1, 1), (0, 0)])
        Hs, Ws = m.shape[1], m.shape[2]
        m = sum(zp[:, dy:dy + Hs, dx:dx + Ws, dy * 3 + dx]
                for dy in range(3) for dx in range(3))[..., None]     # [B, HS, WS, 1]

    out = m[..., 0].astype(jnp.float32) + lr_up[:, 0]
    return out[:, None]                                               # NCHW


def l1_loss(sr: jnp.ndarray, hr: jnp.ndarray) -> jnp.ndarray:
    """Plain L1 (reference model/LFT.py:269-277)."""
    return jnp.mean(jnp.abs(sr - hr))


LFT = register_model(ModelDef(name="LFT", init=init_params, apply=forward,
                              loss=l1_loss,
                              capabilities=frozenset({"remat", "fused"})))
