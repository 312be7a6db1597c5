"""Subprocess driver: run the REFERENCE's own evaluation pipeline.

Imports the reference's modules from the read-only mount and calls its own
`test(test_loader, device, net)` (reference test.py:73-111) — LFdivide,
serial batch-1 patch forwards, LFintegrate, cal_metrics — on a prepared
h5 test tree + `.pth` checkpoint, printing one JSON line per dataset.

Only two reference dependencies are absent in this environment and get
API-compatible stubs injected via sys.modules (no reference code is copied):

* `skimage.metrics` — replaced with scipy-based PSNR/SSIM that reproduce
  skimage's float `data_range` inference (PSNR: 1.0 when the reference image
  is non-negative else 2.0; SSIM: 2.0), gaussian_weights=True semantics
  (sigma 1.5, truncate 3.5, sample covariance). These are the exact
  semantics `lft_tpu.ops.metrics` implements and `tests/test_metrics.py`
  verifies, so the comparison isolates the *pipeline* (tiling, forward,
  stitching), not metric-library differences.
* `torchvision.transforms.ToTensor` — 6-line equivalent for 2-D float h5
  arrays (the only input shape the reference test loader feeds it).

Usage (see tools/parity_eval.py, which builds the data and invokes this):

    python tools/_ref_eval_driver.py <reference_root> <ckpt.pth> \
        [reference option.py flags...]
"""

from __future__ import annotations

import importlib
import importlib.util
import json
import os
import sys
import types

import numpy as np


def _install_skimage_stub():
    from scipy.ndimage import gaussian_filter

    def peak_signal_noise_ratio(image_true, image_test, data_range=None):
        it = np.asarray(image_true, dtype=np.float64)
        ie = np.asarray(image_test, dtype=np.float64)
        if data_range is None:
            data_range = 1.0 if it.min() >= 0 else 2.0
        mse = np.mean((it - ie) ** 2)
        return 10.0 * np.log10(data_range ** 2 / mse)

    def structural_similarity(im1, im2, gaussian_weights=False,
                              data_range=None, sigma=1.5, truncate=3.5, **kw):
        assert gaussian_weights, "stub implements gaussian_weights=True only"
        im1 = np.asarray(im1, dtype=np.float64)
        im2 = np.asarray(im2, dtype=np.float64)
        if data_range is None:
            data_range = 2.0  # skimage float dtype_range spread
        r = int(truncate * sigma + 0.5)
        win = 2 * r + 1
        NP = win ** 2
        cov_norm = NP / (NP - 1)  # sample covariance
        f = lambda x: gaussian_filter(x, sigma=sigma, truncate=truncate,
                                      mode="reflect")
        ux, uy = f(im1), f(im2)
        uxx, uyy, uxy = f(im1 * im1), f(im2 * im2), f(im1 * im2)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        C1 = (0.01 * data_range) ** 2
        C2 = (0.03 * data_range) ** 2
        S = (((2 * ux * uy + C1) * (2 * vxy + C2))
             / ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)))
        pad = (win - 1) // 2
        return S[pad:-pad, pad:-pad].mean()

    sk = types.ModuleType("skimage")
    m = types.ModuleType("skimage.metrics")
    m.peak_signal_noise_ratio = peak_signal_noise_ratio
    m.structural_similarity = structural_similarity
    sk.metrics = m
    sys.modules["skimage"] = sk
    sys.modules["skimage.metrics"] = m


def _install_torchvision_stub():
    try:
        import torchvision  # noqa: F401
        return
    except ImportError:
        pass
    import torch

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[None]
            else:
                arr = arr.transpose(2, 0, 1)
            t = torch.from_numpy(np.ascontiguousarray(arr))
            if arr.dtype == np.uint8:
                t = t.float().div(255)
            return t.float()

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.ToTensor = ToTensor
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def main():
    ref_root, ckpt_path = sys.argv[1], sys.argv[2]
    option_flags = sys.argv[3:]
    sys.path.insert(0, ref_root)
    _install_skimage_stub()
    _install_torchvision_stub()

    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    # The reference parses argv at import time (reference option.py:27);
    # feed it the flags we were given.
    sys.argv = [sys.argv[0]] + list(option_flags)
    from option import args  # noqa: E402  (reference module)
    ds_mod = importlib.import_module("utils.utils_datasets")
    spec = importlib.util.spec_from_file_location(
        "ref_test", os.path.join(ref_root, "test.py"))
    ref_test = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_test)

    MODEL = importlib.import_module("model." + args.model_name)
    net = MODEL.get_model(args)
    ckpt = torch.load(ckpt_path, map_location="cpu")
    net.load_state_dict(ckpt["state_dict"])
    net.eval()

    names, loaders, total = ds_mod.MultiTestSetDataLoader(args)
    device = torch.device("cpu")
    with torch.no_grad():
        for name, loader in zip(names, loaders):
            p, s = ref_test.test(loader, device, net)
            print(json.dumps({"dataset": name, "psnr": p, "ssim": s}),
                  flush=True)


if __name__ == "__main__":
    main()
