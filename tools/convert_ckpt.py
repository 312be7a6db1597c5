"""Checkpoint conversion CLI: reference torch .pth <-> native .npz.

    python tools/convert_ckpt.py in.pth out.npz      # import reference ckpt
    python tools/convert_ckpt.py in.npz out.pth      # export for the reference

Shapes are validated against the LFT parameter schema when --channels /
--scale_factor are given (inferred from the checkpoint otherwise).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--channels", type=int, default=None)
    ap.add_argument("--scale_factor", type=int, default=None)
    ns = ap.parse_args(argv)

    from lft_tpu.utils.checkpoint import (load_checkpoint, params_to_pth,
                                          save_checkpoint, validate_params)
    params, epoch, opt = load_checkpoint(ns.src)

    channels = ns.channels
    scale = ns.scale_factor
    if channels is None and "conv_init0.0.weight" in params:
        channels = params["conv_init0.0.weight"].shape[0]
    if scale is None and "upsampling.0.weight" in params and channels:
        scale = int(round((params["upsampling.0.weight"].shape[0] / channels) ** 0.5))
    if channels and scale:
        from lft_tpu.models.lft import param_shapes
        validate_params(params, param_shapes(channels, scale))
        print(f"validated LFT schema: channels={channels} scale={scale}")

    if ns.dst.endswith(".pth") or ns.dst.endswith(".pt"):
        params_to_pth(params, ns.dst, epoch=epoch)
    else:
        save_checkpoint(ns.dst, params, epoch=epoch, opt_state_flat=opt)
    print(f"wrote {ns.dst} (epoch {epoch}, {len(params)} tensors)")


if __name__ == "__main__":
    main()
