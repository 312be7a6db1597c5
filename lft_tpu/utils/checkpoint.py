"""Checkpointing and torch `.pth` interop.

The reference saves pickle dicts `{'epoch': int, 'state_dict': OrderedDict}`
every epoch, named `'%s_%dx%d_%dx_epoch_%02d_model.pth'`
(reference train.py:95-103). Because our parameters keep the exact torch
state_dict names and layouts (lft_tpu/models/lft.py), conversion in either
direction is a dtype cast -- published reference checkpoints load directly.

Native format is a flat `.npz` (name -> float32 array) carrying `epoch` and,
unlike the reference (which silently drops Adam moments on resume,
reference train.py:40-64 / SURVEY.md §3.5), optionally the full optimizer
state so resume is exact. Loading failures raise instead of silently falling
back to scratch (the reference's bare-except footgun, train.py:60-64).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

_EPOCH_KEY = "__epoch__"
_OPT_PREFIX = "__opt__/"


def save_checkpoint(path: str, params: Dict[str, np.ndarray], epoch: int,
                    opt_state_flat: Optional[Dict[str, np.ndarray]] = None) -> None:
    """Write a flat .npz checkpoint (atomically via temp + rename)."""
    payload = {k: np.asarray(v) for k, v in params.items()}
    payload[_EPOCH_KEY] = np.asarray(epoch, dtype=np.int64)
    if opt_state_flat:
        for k, v in opt_state_flat.items():
            payload[_OPT_PREFIX + k] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], int,
                                        Optional[Dict[str, np.ndarray]]]:
    """Load a checkpoint: returns (params, epoch, opt_state_flat or None).

    Accepts either the native .npz or a torch .pth (auto-detected)."""
    if path.endswith(".pth") or path.endswith(".pt"):
        params, epoch = pth_to_params(path)
        return params, epoch, None
    with np.load(path) as z:
        params, opt = {}, {}
        epoch = 0
        for k in z.files:
            if k == _EPOCH_KEY:
                epoch = int(z[k])
            elif k.startswith(_OPT_PREFIX):
                opt[k[len(_OPT_PREFIX):]] = z[k]
            else:
                params[k] = z[k]
    return params, epoch, (opt or None)


def _strip_module_prefix(state_dict) -> Dict[str, np.ndarray]:
    """Accept both bare and 'module.'-prefixed (DataParallel) key layouts,
    like the reference's dual-attempt loader (reference train.py:45-59)."""
    out = {}
    for k, v in state_dict.items():
        name = k[len("module."):] if k.startswith("module.") else k
        out[name] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                               dtype=np.float32)
    return out


def pth_to_params(path: str) -> Tuple[Dict[str, np.ndarray], int]:
    """Load a reference torch checkpoint -> (params, epoch).

    Handles both the reference's `{'epoch', 'state_dict'}` wrapper
    (reference train.py:98-101) and a bare state_dict."""
    try:
        import torch
    except ImportError as e:
        raise ImportError(".pth conversion requires torch (CPU build is fine); "
                          "use the native .npz format otherwise") from e
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        epoch = int(ckpt.get("epoch", 0))
        state = ckpt["state_dict"]
    else:
        epoch = 0
        state = ckpt
    return _strip_module_prefix(state), epoch


def params_to_pth(params: Dict[str, np.ndarray], path: str, epoch: int = 0) -> None:
    """Export params as a reference-compatible torch checkpoint
    (`{'epoch', 'state_dict'}`, reference train.py:98-101) so models trained
    here can be evaluated by the reference implementation."""
    try:
        import torch
    except ImportError as e:
        raise ImportError(".pth export requires torch (CPU build is fine)") from e
    from collections import OrderedDict
    state = OrderedDict((k, torch.from_numpy(np.asarray(v, dtype=np.float32)))
                        for k, v in params.items())
    torch.save({"epoch": int(epoch), "state_dict": state}, path)


def validate_params(params: Dict[str, np.ndarray], expected_shapes: Dict[str, tuple]) -> None:
    """Raise with a precise message on any missing/unexpected/mis-shaped
    entry (replacing the reference's silent fallback, train.py:60-64)."""
    missing = sorted(set(expected_shapes) - set(params))
    unexpected = sorted(set(params) - set(expected_shapes))
    bad = [f"{k}: got {tuple(np.shape(params[k]))}, want {tuple(s)}"
           for k, s in expected_shapes.items()
           if k in params and tuple(np.shape(params[k])) != tuple(s)]
    if missing or unexpected or bad:
        raise ValueError("checkpoint/param mismatch:\n"
                         + (f"  missing: {missing}\n" if missing else "")
                         + (f"  unexpected: {unexpected}\n" if unexpected else "")
                         + ("  shapes:\n    " + "\n    ".join(bad) if bad else ""))
