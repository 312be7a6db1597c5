"""Generate golden parity fixtures from the reference implementation.

Runs the REFERENCE torch model (mounted read-only at /root/reference) on
fixed inputs and saves inputs/outputs/state_dicts as .npz files under
goldens/. The fixtures are committed; the test suite only reads the .npz
files and never needs torch or the reference mount.

Usage:  python tools/gen_goldens.py [--reference /root/reference]

This script is the only place that touches the reference at runtime; it
imports its modules (it does not copy code).
"""

from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np
import torch

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "goldens")


def load_reference(ref_path: str):
    sys.path.insert(0, ref_path)
    import importlib
    lft_mod = importlib.import_module("model.LFT")
    # utils.utils imports skimage (absent here; we only use the tiling
    # helpers) and the global argparse module `option` at import time;
    # stub the former and pre-seed sys.argv for the latter.
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.metrics = types.ModuleType("skimage.metrics")
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = sk.metrics
    argv = sys.argv
    sys.argv = [argv[0]]
    utils_mod = importlib.import_module("utils.utils")
    imresize_mod = importlib.import_module("utils.imresize")
    sys.argv = argv
    return lft_mod, utils_mod, imresize_mod


def make_args(ang_res=5, scale=2, channels=64):
    ns = types.SimpleNamespace()
    ns.angRes = ang_res
    ns.scale_factor = scale
    ns.channels = channels
    return ns


def golden_model_forward(lft_mod, ang_res, scale, channels, h, w, batch, seed, name):
    torch.manual_seed(seed)
    args = make_args(ang_res, scale, channels)
    net = lft_mod.get_model(args)
    net.eval()
    rng = np.random.RandomState(seed)
    x = rng.rand(batch, 1, ang_res * h, ang_res * w).astype(np.float32)
    with torch.no_grad():
        out = net(torch.from_numpy(x))
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(
        os.path.join(OUT_DIR, name),
        x=x, out=out.numpy(),
        **{"param." + k: v for k, v in state.items()},
        meta=np.array([ang_res, scale, channels, h, w, batch], dtype=np.int64))
    print(f"{name}: out {tuple(out.shape)} mean {out.mean():.6f}")


def golden_submodules(lft_mod, name, seed=7):
    """Per-op goldens: PositionEncoding, gen_mask, interpolate (torch
    bicubic), unfold tokenization, MultiheadAttention."""
    torch.manual_seed(seed)
    rng = np.random.RandomState(seed)
    data = {}

    # PositionEncoding (reference model/LFT.py:86-115)
    pe = lft_mod.PositionEncoding(temperature=10000)
    buf = torch.zeros(1, 16, 25, 6, 9)  # [B, C, A2, h, w]
    data["pe_spa"] = pe.forward(buf, dim=[3, 4], token_dim=16).numpy()
    data["pe_ang"] = pe.forward(buf, dim=[2], token_dim=16).numpy()

    # gen_mask (reference model/LFT.py:147-162)
    data["mask_8x8_k5"] = lft_mod.SpaTrans.gen_mask(8, 8, 5).numpy()
    data["mask_6x6_k3"] = lft_mod.SpaTrans.gen_mask(6, 6, 3).numpy()

    # torch bicubic interpolate (reference model/LFT.py:255-266)
    x = rng.rand(2, 1, 5 * 7, 5 * 7).astype(np.float32)
    data["interp_x"] = x
    data["interp_s2"] = lft_mod.interpolate(torch.from_numpy(x), 5, 2, "bicubic").numpy()
    data["interp_s4"] = lft_mod.interpolate(torch.from_numpy(x), 5, 4, "bicubic").numpy()

    # unfold+MLP tokenization (reference model/LFT.py:164-169)
    import torch.nn.functional as F
    xt = torch.from_numpy(rng.rand(3, 4, 6, 5).astype(np.float32))  # [N, C, h, w]
    tok = F.unfold(xt, kernel_size=3, padding=1).permute(2, 0, 1)   # [hw, N, C*9]
    W = torch.from_numpy(rng.rand(8, 4 * 9).astype(np.float32) - 0.5)
    data["unfold_x"] = xt.numpy()
    data["unfold_w"] = W.numpy()
    data["unfold_tok"] = (tok @ W.T).numpy()

    # nn.MultiheadAttention parity (packed in_proj, no biases, q=k!=v)
    E, H, T, B = 16, 4, 10, 3
    mha = torch.nn.MultiheadAttention(E, H, dropout=0.0, bias=False)
    mha.out_proj.bias = None
    torch.nn.init.kaiming_uniform_(mha.in_proj_weight, a=np.sqrt(5))
    qn = torch.from_numpy(rng.rand(T, B, E).astype(np.float32))
    v = torch.from_numpy(rng.rand(T, B, E).astype(np.float32))
    mask = torch.from_numpy(
        np.where(rng.rand(T, T) < 0.7, 0.0, -np.inf).astype(np.float32))
    with torch.no_grad():
        out_nomask = mha(qn, qn, v, need_weights=False)[0]
        out_mask = mha(qn, qn, v, need_weights=False, attn_mask=mask)[0]
    data["mha_qn"] = qn.numpy()
    data["mha_v"] = v.numpy()
    data["mha_in_proj"] = mha.in_proj_weight.detach().numpy()
    data["mha_out_proj"] = mha.out_proj.weight.detach().numpy()
    data["mha_mask"] = mask.numpy()
    data["mha_out_nomask"] = out_nomask.numpy()
    data["mha_out_mask"] = out_mask.numpy()

    np.savez_compressed(os.path.join(OUT_DIR, name), **data)
    print(f"{name}: {len(data)} arrays")


def golden_tiling(utils_mod, name, seed=11):
    """LFdivide / ImageExtend / LFintegrate goldens
    (reference utils/utils.py:91-157)."""
    rng = np.random.RandomState(seed)
    data = {}
    # ImageExtend
    im = rng.rand(9, 7).astype(np.float32)
    data["ext_im"] = im
    data["ext_out"] = utils_mod.ImageExtend(torch.from_numpy(im), 3).numpy()
    # LFdivide on a small scene: A=5, per-view 21x17, patch 8, stride 4
    a, h0, w0, patch, stride = 5, 21, 17, 8, 4
    mosaic = rng.rand(a * h0, a * w0).astype(np.float32)
    sub = utils_mod.LFdivide(torch.from_numpy(mosaic), a, patch, stride)
    data["div_mosaic"] = mosaic
    data["div_out"] = sub.numpy()
    data["div_meta"] = np.array([a, h0, w0, patch, stride], dtype=np.int64)
    # LFintegrate of the same patches (identity SR, scale=1)
    outlf = utils_mod.LFintegrate(sub, a, patch, stride, h0, w0)
    data["int_out"] = outlf.numpy()
    np.savez_compressed(os.path.join(OUT_DIR, name), **data)
    print(f"{name}: {len(data)} arrays")


def golden_imresize(imresize_mod, name, seed=13):
    """Matlab-style imresize goldens (reference utils/imresize.py)."""
    rng = np.random.RandomState(seed)
    data = {}
    im = rng.rand(24, 20).astype(np.float64)
    data["im"] = im
    data["down2"] = imresize_mod.imresize(im, scalar_scale=0.5)
    data["down4"] = imresize_mod.imresize(im, scalar_scale=0.25)
    data["up2"] = imresize_mod.imresize(im, scalar_scale=2.0)
    data["shape_13x11"] = imresize_mod.imresize(im, output_shape=(13, 11))
    # the reference's (dead in its own data path) triangle-kernel branch
    data["bl_down2"] = imresize_mod.imresize(im, scalar_scale=0.5,
                                             method="bilinear")
    data["bl_up2"] = imresize_mod.imresize(im, scalar_scale=2.0,
                                           method="bilinear")
    data["bl_shape_13x11"] = imresize_mod.imresize(im, output_shape=(13, 11),
                                                   method="bilinear")
    np.savez_compressed(os.path.join(OUT_DIR, name), **data)
    print(f"{name}: {len(data)} arrays")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    os.makedirs(OUT_DIR, exist_ok=True)
    torch.set_num_threads(1)
    lft_mod, utils_mod, imresize_mod = load_reference(args.reference)

    golden_submodules(lft_mod, "ops.npz")
    golden_tiling(utils_mod, "tiling.npz")
    golden_imresize(imresize_mod, "imresize.npz")
    # Full-model forwards: small channel count to keep fixtures light but
    # exercising every layer; plus one full-size 64-channel config.
    golden_model_forward(lft_mod, 5, 2, 16, 8, 8, 2, seed=3, name="model_s2_c16.npz")
    golden_model_forward(lft_mod, 5, 4, 16, 8, 8, 1, seed=4, name="model_s4_c16.npz")
    golden_model_forward(lft_mod, 5, 2, 64, 16, 16, 1, seed=5, name="model_s2_c64.npz")
    golden_model_forward(lft_mod, 5, 4, 64, 16, 16, 1, seed=6, name="model_s4_c64.npz")


if __name__ == "__main__":
    main()
