"""Hash of the shipping numeric path's sources.

The quality gate on the headline bench (bench.py) trusts the committed
PARITY_bf16.json artifact (tools/parity_bf16.py). That artifact is only
meaningful for the kernel/model sources it was measured on: after a kernel
change, the gate would otherwise assert on a delta measured on OLD kernels
(ADVICE round-4 item 4). Both sides compute this hash -- the parity tool
records it in the artifact, the bench refuses a stale artifact.

Comment/docstring edits do change the hash (hashing is textual); that is
an acceptable false positive -- re-running the parity harness is cheap
next to shipping a wrong quality claim.
"""

from __future__ import annotations

import hashlib
import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# everything the shipping eval configuration's numerics flow through
_HASHED_DIRS = ("lft_tpu/kernels", "lft_tpu/ops")
_HASHED_FILES = ("lft_tpu/models/lft.py", "lft_tpu/inference/tiled.py")


def shipping_source_hash(repo: str = _REPO) -> str:
    """SHA-256 over the sorted shipping-path sources (path + content)."""
    paths = list(_HASHED_FILES)
    for d in _HASHED_DIRS:
        full = os.path.join(repo, d)
        for name in sorted(os.listdir(full)):
            if name.endswith(".py"):
                paths.append(os.path.join(d, name))
    h = hashlib.sha256()
    for rel in sorted(paths):
        h.update(rel.encode())
        with open(os.path.join(repo, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()
