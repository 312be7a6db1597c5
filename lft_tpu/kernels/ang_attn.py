"""Fused angular attention -- public wrapper.

Two trainable (custom-VJP) implementations exist:

* `ang_attn_mxu.ang_attention_mxu` -- block-diagonal head-packed MXU
  kernel (one full-size [128, 128] x [128, 1024]-class contraction per
  5-pixel group). The default: measured fastest on v5e.
* `ang_attn_vjp.ang_attention_pallas_ad` -- key-view-sweep online-softmax
  kernel (VPU-heavy). Kept as the fallback / A-B reference.
"""

import os

from lft_tpu.kernels.ang_attn_vjp import (  # noqa: F401
    ang_attention, ang_attention_pallas_ad,
)
from lft_tpu.kernels.ang_attn_mxu import ang_attention_mxu  # noqa: F401


def ang_attention_pallas(qn, v, in_proj_weight, out_proj_weight,
                         num_heads):
    """Default fused angular attention: the block-diag MXU kernel when the
    view count fits its 128-key block (every production angRes does; a
    hypothetical angRes >= 12 has A2 > 128), else the key-sweep kernel,
    which supports any A2. Env `LFT_ANG_VARIANT=sweep` forces the sweep
    kernel (perf A/B without code edits)."""
    from lft_tpu.kernels.ang_attn_mxu import mxu_applicable
    A2 = qn.shape[-2]
    variant = os.environ.get("LFT_ANG_VARIANT", "mxu")
    if variant not in ("mxu", "sweep"):
        raise ValueError(
            f"unknown angular attention variant {variant!r} "
            f"(LFT_ANG_VARIANT?); valid: ('mxu', 'sweep')")
    if variant == "sweep" or not mxu_applicable(A2):
        return ang_attention_pallas_ad(qn, v, in_proj_weight,
                                       out_proj_weight, num_heads)
    return ang_attention_mxu(qn, v, in_proj_weight, out_proj_weight,
                             num_heads)
