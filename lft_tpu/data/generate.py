"""Matlab-free data generation.

Python replacements for the reference's two Matlab scripts
(reference Generate_Data_for_Training.m, Generate_Data_for_Test.m), producing
byte-compatible `.h5` files (datasets `/Lr_SAI_y`, `/Hr_SAI_y`, float32,
*column-major* layout exactly as Matlab's h5write emits, so the reference's
loaders -- which do (train) or don't (test) transpose -- behave identically
on our files; reference utils/utils_datasets.py:38-39, 87-90).

Semantics reproduced:
* central `angRes x angRes` angular crop: Matlab `0.5*(U-A+2) : 0.5*(U+A)`
  1-based == Python `(U-A)//2 : (U-A)//2 + A` (Generate_Data_for_Training.m:38);
* per-view Matlab `rgb2ycbcr` on [0,1] doubles -> Y channel
  (Generate_Data_for_Training.m:55-57);
* LR views via Matlab-bicubic (Keys a=-0.5, antialiased) downscale
  (lft_tpu/ops/bicubic.resize_matrix_matlab; Generate_Data_for_Training.m:61);
* training: HR patches `patchsize = factor*32` at `stride = patchsize/2`
  over `1 : stride : H-patchsize+1` (Generate_Data_for_Training.m:8-9,42-43),
  one .h5 per patch named %06d.h5;
* test: whole scenes with H, W floored to multiples of 4
  (Generate_Data_for_Test.m:34-39), one .h5 per scene.

Scene inputs are `.mat` files holding a 5-D `LF[U, V, H, W, 3+]` array
(both classic and v7.3/HDF5 .mat are supported). Integer-typed LFs are
scaled to [0, 1] by their dtype max.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterable, Optional

import numpy as np
import h5py

from lft_tpu.ops.bicubic import resize_matrix_matlab
from lft_tpu.ops.color import rgb2ycbcr


def load_mat_lf(path: str, var: str = "LF") -> np.ndarray:
    """Load the `LF[U, V, H, W, C]` array from a .mat scene file.

    Handles classic (scipy.io) and v7.3 (HDF5) formats. v7.3 stores arrays
    transposed (Matlab column-major), so axes are reversed back.
    """
    if h5py.is_hdf5(path):
        # v7.3 .mat is HDF5 (with a user block); h5py sees Matlab's
        # column-major arrays reversed, so restore the Matlab axis order.
        with h5py.File(path, "r") as f:
            lf = np.asarray(f[var])
            lf = np.transpose(lf, tuple(range(lf.ndim))[::-1])
    else:
        import scipy.io as sio
        lf = np.asarray(sio.loadmat(path)[var])
    if lf.ndim != 5:
        raise ValueError(f"{path}: expected 5-D LF array, got {lf.shape}")
    if np.issubdtype(lf.dtype, np.integer):
        lf = lf.astype(np.float64) / np.iinfo(lf.dtype).max
    else:
        lf = lf.astype(np.float64)
    return lf


def _central_views(lf: np.ndarray, ang_res: int) -> np.ndarray:
    """Matlab `LF(0.5*(U-A+2):0.5*(U+A), ...)` central angular crop
    (Generate_Data_for_Training.m:38)."""
    U, V = lf.shape[:2]
    su, sv = (U - ang_res) // 2, (V - ang_res) // 2
    return lf[su:su + ang_res, sv:sv + ang_res, :, :, :3]


def _lf_to_y(lf: np.ndarray) -> np.ndarray:
    """[U, V, H, W, 3] RGB -> [U, V, H, W] Y channel (BT.601, [0,1] domain)."""
    return rgb2ycbcr(lf)[..., 0]


def _write_h5(path: str, lr: np.ndarray, hr: np.ndarray) -> None:
    """Write float32 datasets in Matlab h5write's column-major layout:
    h5py sees Matlab-written arrays transposed, so we store the transpose."""
    with h5py.File(path, "w") as f:
        f.create_dataset("Lr_SAI_y", data=lr.astype(np.float32).T)
        f.create_dataset("Hr_SAI_y", data=hr.astype(np.float32).T)


def _downscale_matlab(img: np.ndarray, factor: int) -> np.ndarray:
    """Antialiased Matlab-bicubic 1/factor downscale via static matrices."""
    H, W = img.shape
    Wh = resize_matrix_matlab(H, H // factor).astype(np.float64)
    Ww = resize_matrix_matlab(W, W // factor).astype(np.float64)
    return Wh @ img @ Ww.T


def _mosaic(views_y: np.ndarray) -> np.ndarray:
    """[U, V, h, w] -> [U*h, V*w] SAI mosaic."""
    U, V, h, w = views_y.shape
    return views_y.transpose(0, 2, 1, 3).reshape(U * h, V * w)


def list_scene_files(src_dir: str) -> list:
    return sorted(str(p) for p in Path(src_dir).iterdir()
                  if p.suffix.lower() == ".mat")


def generate_training_data(src_data_path: str, save_root: str, ang_res: int = 5,
                           factor: int = 4, datasets: Optional[Iterable[str]] = None,
                           log=print) -> int:
    """Emit data_for_train/SR_{A}x{A}_{S}x/<dataset>/NNNNNN.h5 patch files
    (reference Generate_Data_for_Training.m). Returns total patch count."""
    patchsize = factor * 32
    stride = patchsize // 2
    src = Path(src_data_path)
    names = sorted(datasets) if datasets else sorted(
        p.name for p in src.iterdir() if p.is_dir())
    total = 0
    for name in names:
        scene_dir = src / name / "training"
        if not scene_dir.is_dir():
            continue
        out_dir = Path(save_root) / f"SR_{ang_res}x{ang_res}_{factor}x" / name
        out_dir.mkdir(parents=True, exist_ok=True)
        idx_save = 0
        for scene_path in list_scene_files(str(scene_dir)):
            lf = _central_views(load_mat_lf(scene_path), ang_res)
            y = _lf_to_y(lf)                       # [A, A, H, W]
            A, _, H, W = y.shape
            n_scene = 0
            for h0 in range(0, H - patchsize + 1, stride):
                for w0 in range(0, W - patchsize + 1, stride):
                    hr_views = y[:, :, h0:h0 + patchsize, w0:w0 + patchsize]
                    lr_views = np.stack([
                        np.stack([_downscale_matlab(hr_views[u, v], factor)
                                  for v in range(A)]) for u in range(A)])
                    idx_save += 1
                    n_scene += 1
                    _write_h5(str(out_dir / f"{idx_save:06d}.h5"),
                              _mosaic(lr_views), _mosaic(hr_views))
            total += n_scene
            log(f"{name}/{Path(scene_path).stem}: {n_scene} training samples")
    return total


def generate_test_data(src_data_path: str, save_root: str, ang_res: int = 5,
                       factor: int = 4, datasets: Optional[Iterable[str]] = None,
                       log=print) -> int:
    """Emit data_for_test/SR_{A}x{A}_{S}x/<dataset>/<scene>.h5 whole-scene
    files (reference Generate_Data_for_Test.m). Returns scene count."""
    src = Path(src_data_path)
    names = sorted(datasets) if datasets else sorted(
        p.name for p in src.iterdir() if p.is_dir())
    total = 0
    for name in names:
        scene_dir = src / name / "test"
        if not scene_dir.is_dir():
            continue
        out_dir = Path(save_root) / f"SR_{ang_res}x{ang_res}_{factor}x" / name
        out_dir.mkdir(parents=True, exist_ok=True)
        for scene_path in list_scene_files(str(scene_dir)):
            lf = load_mat_lf(scene_path)
            H, W = lf.shape[2] - lf.shape[2] % 4, lf.shape[3] - lf.shape[3] % 4
            lf = _central_views(lf[:, :, :H, :W], ang_res)
            y = _lf_to_y(lf)
            A = y.shape[0]
            lr_views = np.stack([
                np.stack([_downscale_matlab(y[u, v], factor)
                          for v in range(A)]) for u in range(A)])
            _write_h5(str(out_dir / f"{Path(scene_path).stem}.h5"),
                      _mosaic(lr_views), _mosaic(y))
            total += 1
            log(f"{name}/{Path(scene_path).stem}: 1 test sample")
    return total
