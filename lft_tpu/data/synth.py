"""Synthetic light-field scenes for tests, benchmarks and e2e runs.

Generates plausible LF structure (a textured plane with per-view disparity
shifts, so angular attention has real signal), writes `.mat` scene files
and/or the processed `data_for_train`/`data_for_test` h5 layout directly.
Lets every pipeline stage run end-to-end with zero external data.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import h5py

from lft_tpu.data.generate import (_central_views, _downscale_matlab, _lf_to_y,
                                   _mosaic, _write_h5)


def synth_lf_scene(ang_res: int = 5, height: int = 128, width: int = 128,
                   disparity: float = 1.0, seed: int = 0) -> np.ndarray:
    """[A, A, H, W, 3] float64 synthetic light field in [0, 1]:
    band-limited texture shifted per view by (u, v) * disparity."""
    rng = np.random.RandomState(seed)
    pad = int(abs(disparity) * ang_res) + 2
    base = rng.rand(height + 2 * pad, width + 2 * pad, 3)
    # band-limit via separable box blurs for smooth, interpolable texture
    for _ in range(3):
        base = (base + np.roll(base, 1, 0) + np.roll(base, -1, 0)
                + np.roll(base, 1, 1) + np.roll(base, -1, 1)) / 5.0
    base = (base - base.min()) / (base.max() - base.min() + 1e-9)
    c = (ang_res - 1) / 2.0
    views = np.empty((ang_res, ang_res, height, width, 3))
    yy = np.arange(height) + pad
    xx = np.arange(width) + pad
    for u in range(ang_res):
        for v in range(ang_res):
            dy = (u - c) * disparity
            dx = (v - c) * disparity
            y0 = yy + int(round(dy))
            x0 = xx + int(round(dx))
            views[u, v] = base[np.ix_(y0, x0)]
    return views


def write_synth_scene_mat(path: str, ang_res: int = 9, height: int = 128,
                          width: int = 128, seed: int = 0,
                          fmt: str = "v73", lf: np.ndarray = None) -> np.ndarray:
    """Write a .mat scene with an `LF[U,V,H,W,3]` variable and return the
    array. `fmt='v73'` emits the HDF5-based layout (stored axis-reversed like
    Matlab's column-major h5 writes); `fmt='classic'` emits a v5 .mat via
    scipy. Both are accepted by `lft_tpu.data.generate.load_mat_lf`."""
    if lf is None:
        lf = synth_lf_scene(ang_res, height, width, seed=seed)
    if fmt == "v73":
        with h5py.File(path, "w") as f:
            f.create_dataset("LF", data=np.transpose(lf, (4, 3, 2, 1, 0)))
    elif fmt == "classic":
        import scipy.io as sio
        sio.savemat(path, {"LF": lf})
    else:
        raise ValueError(f"unknown .mat fmt {fmt!r}")
    return lf


def make_synth_data(root: str, ang_res: int = 5, scale: int = 2,
                    n_train: int = 8, n_test: int = 2, train_patch: int = 32,
                    test_hw: int = 64, dataset_name: str = "SynthLF",
                    seed: int = 0) -> dict:
    """Create a ready-to-train data_for_train/ + data_for_test/ tree with
    synthetic scenes (bypassing .mat files; same h5 schema as the
    generators). Returns the paths dict."""
    patch_hr = train_patch * scale
    train_dir = Path(root) / "data_for_train" / f"SR_{ang_res}x{ang_res}_{scale}x" / dataset_name
    test_dir = Path(root) / "data_for_test" / f"SR_{ang_res}x{ang_res}_{scale}x" / dataset_name
    train_dir.mkdir(parents=True, exist_ok=True)
    test_dir.mkdir(parents=True, exist_ok=True)

    for i in range(n_train):
        lf = synth_lf_scene(ang_res, patch_hr, patch_hr, seed=seed + i)
        y = _lf_to_y(lf)
        lr = np.stack([np.stack([_downscale_matlab(y[u, v], scale)
                                 for v in range(ang_res)])
                       for u in range(ang_res)])
        _write_h5(str(train_dir / f"{i + 1:06d}.h5"), _mosaic(lr), _mosaic(y))

    for i in range(n_test):
        lf = synth_lf_scene(ang_res, test_hw * scale, test_hw * scale,
                            seed=seed + 1000 + i)
        y = _lf_to_y(lf)
        lr = np.stack([np.stack([_downscale_matlab(y[u, v], scale)
                                 for v in range(ang_res)])
                       for u in range(ang_res)])
        _write_h5(str(test_dir / f"scene_{i:02d}.h5"), _mosaic(lr), _mosaic(y))

    return {"path_for_train": str(Path(root) / "data_for_train") + os.sep,
            "path_for_test": str(Path(root) / "data_for_test") + os.sep,
            "data_name": dataset_name}
