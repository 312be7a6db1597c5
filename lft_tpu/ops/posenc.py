"""Sinusoidal position encodings.

Parity re-implementation of the reference `PositionEncoding`
(reference model/LFT.py:86-115), with its exact quirks:

* the frequency grid is `T ** (2*floor(i/2)/D)` for channel i in [0, D);
* the per-position vector is `concat(sin(p/f)[0::2], cos(p/f)[1::2])` --
  a *concatenation* of the even-index sines and odd-index cosines, NOT the
  usual interleave;
* when several dims are encoded the per-dim encodings are broadcast-summed
  and divided by the number of dims (reference model/LFT.py:107-115).

These are static functions of (length, token_dim); under jit they constant-
fold, so the encodings cost nothing at runtime.
"""

from __future__ import annotations

import numpy as np


def position_encoding_1d(length: int, token_dim: int, temperature: float = 10000.0) -> np.ndarray:
    """[length, token_dim] float32 encoding for one dimension
    (reference model/LFT.py:94-104)."""
    i = np.arange(token_dim, dtype=np.float32)
    grid_dim = 2.0 * np.floor(i / 2.0) / float(token_dim)
    grid_dim = np.asarray(temperature, dtype=np.float32) ** grid_dim
    pos = np.arange(length, dtype=np.float32)[:, None] / grid_dim[None, :]
    out = np.concatenate([np.sin(pos[:, 0::2]), np.cos(pos[:, 1::2])], axis=1)
    return out.astype(np.float32)


def spatial_position(h: int, w: int, token_dim: int, temperature: float = 10000.0) -> np.ndarray:
    """[h, w, token_dim]: average of the h- and w-dim encodings
    (reference model/LFT.py:69, dims [3, 4] of the 5-D buffer)."""
    ph = position_encoding_1d(h, token_dim, temperature)  # [h, D]
    pw = position_encoding_1d(w, token_dim, temperature)  # [w, D]
    return ((ph[:, None, :] + pw[None, :, :]) / 2.0).astype(np.float32)


def angular_position(num_views: int, token_dim: int, temperature: float = 10000.0) -> np.ndarray:
    """[num_views, token_dim]: single-dim encoding over the A^2 view axis
    (reference model/LFT.py:70, dim [2])."""
    return position_encoding_1d(num_views, token_dim, temperature)
