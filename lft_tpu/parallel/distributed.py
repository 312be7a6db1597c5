"""Multi-host (multi-process) SPMD entry for the data-parallel trainer.

The reference's distribution story is a vestigial ``--local_rank`` flag
that never activates (no init_process_group / DDP anywhere; reference
train.py:18, SURVEY.md §2.4).  The TPU-native story extends the
single-host ``('dp',)`` mesh across hosts instead: every process calls
``jax.distributed.initialize`` against one coordinator, after which
``jax.devices()`` is the GLOBAL device list and the *same* ``shard_map``
train step (lft_tpu/parallel/mesh.py) runs unchanged — XLA routes the
gradient ``pmean`` over ICI within a host and DCN across hosts.

Data contract: the seeded input pipeline is deterministic (each item's
augmentation RNG derives from ``(seed, epoch, index)``), so every
process materializes the SAME global batch order and feeds only its own
``1/num_processes`` slice; ``local_batch_to_global`` assembles the
distributed global array from those per-process slices without any
cross-host data transfer.

CLI: ``train.py --coordinator host:port --num_processes N
--process_id I`` (plus the usual ``--num_devices`` = global device
count).  Verified by a 2-process CPU integration test
(tests/test_pipeline.py::test_multihost_training_matches_single_process)
asserting multi-process training is step-identical to single-process.
"""

from __future__ import annotations

import numpy as np
import jax

from lft_tpu.parallel.mesh import batch_sharding


def maybe_initialize(args) -> bool:
    """Connect this process to the coordination service iff
    ``--coordinator`` is set.  Must run before any other jax API touches
    the backend (it changes what ``jax.devices()`` returns)."""
    coord = getattr(args, "coordinator", "") or ""
    if not coord:
        return False
    if (jax.config.jax_platforms or "").startswith("cpu"):
        # CPU cross-process collectives need the gloo backend (the TPU
        # path uses ICI/DCN natively); must be set before backend init
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=args.num_processes,
        process_id=args.process_id)
    return True


def local_slice(args, data: np.ndarray, label: np.ndarray):
    """This process's rows of a (deterministically shared) global batch."""
    n = getattr(args, "num_processes", 1) or 1
    if n <= 1:
        return data, label
    if data.shape[0] % n:
        raise ValueError(
            f"global batch {data.shape[0]} must divide by num_processes {n}")
    per = data.shape[0] // n
    i = args.process_id
    return data[i * per:(i + 1) * per], label[i * per:(i + 1) * per]


def make_distributed_put_batch(mesh, args):
    """``put_batch`` for trainer.fit: global-batch numpy (identical on
    every process) -> jax global arrays sharded over 'dp' across all
    hosts.  Each process contributes only its local slice
    (``jax.make_array_from_process_local_data`` performs no cross-host
    transfer when the slice matches the sharding's local shape)."""
    sh = batch_sharding(mesh)

    def put(data, label):
        d, l = local_slice(args, np.asarray(data), np.asarray(label))
        return (jax.make_array_from_process_local_data(sh, d),
                jax.make_array_from_process_local_data(sh, l))

    return put
