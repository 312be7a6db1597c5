"""ITU-R BT.601 RGB <-> YCbCr (Matlab-compatible coefficients).

Parity port of reference utils/utils.py:160-183. Inputs are float arrays in
[0, 1] with channels last ([..., 3]); works with numpy or jax arrays.

Note: the reference's `ycbcr2rgb` subtracts the offsets *after* the inverse
matrix multiply (reference utils/utils.py:179-181), which is not the exact
algebraic inverse of its `rgb2ycbcr`. We reproduce that behavior verbatim for
parity (the function is only used for visualization, never in the train/test
metric path).
"""

from __future__ import annotations

import numpy as np

_MAT = np.array(
    [[65.481, 128.553, 24.966],
     [-37.797, -74.203, 112.0],
     [112.0, -93.786, -18.214]], dtype=np.float64)
_OFFSET = np.array([16.0, 128.0, 128.0], dtype=np.float64)


def rgb2ycbcr(x):
    """[..., 3] RGB in [0,1] -> [..., 3] YCbCr in [0,1]
    (reference utils/utils.py:160-168)."""
    mat = _MAT.T.astype(x.dtype)
    off = _OFFSET.astype(x.dtype)
    return (x @ mat + off) / x.dtype.type(255.0)


def ycbcr2rgb(x):
    """[..., 3] YCbCr in [0,1] -> [..., 3] RGB, reproducing the reference's
    exact arithmetic (reference utils/utils.py:171-183)."""
    mat_inv = (np.linalg.inv(_MAT) * 255.0).T.astype(x.dtype)
    off = (_OFFSET / 255.0).astype(x.dtype)
    return x @ mat_inv - off
