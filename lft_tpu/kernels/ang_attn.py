"""Fused angular attention -- public wrapper.

Implementation (with custom VJP) lives in lft_tpu/kernels/ang_attn_vjp.py;
see that module for the kernel design. This module keeps the historical
entry point name.
"""

from lft_tpu.kernels.ang_attn_vjp import (  # noqa: F401
    ang_attention, ang_attention_pallas_ad,
)

ang_attention_pallas = ang_attention_pallas_ad
