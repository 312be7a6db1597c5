"""Training driver: jitted update step, epoch loop, checkpointing.

Reference behavior mirrored (reference train.py:86-138):
* per-epoch loop to `args.epoch`, shuffled batches, L1 loss;
* per-iteration train PSNR/SSIM -- but computed ON-DEVICE inside the jitted
  step (the reference stalls every iteration on CPU skimage,
  reference train.py:129 / SURVEY.md §3.1);
* per-epoch checkpoint named `'%s_%dx%d_%dx_epoch_%02d_model.pth'`-style
  (reference train.py:96-97), in native .npz or reference .pth format;
* resume from `--use_pre_pth` checkpoints; unlike the reference we also
  save/restore Adam moments (the reference silently drops them,
  SURVEY.md §3.5) -- torch-format resumes start moments fresh, matching
  reference semantics for converted checkpoints.

Multi-chip data parallelism lives in lft_tpu/parallel/mesh.py; the trainer
takes the step function as a pluggable so single- and multi-chip share the
epoch loop.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from lft_tpu.data.datasets import TrainDataset, iterate_batches
from lft_tpu.ops.metrics import cal_metrics
from lft_tpu.training.optim import make_optimizer
from lft_tpu.utils.checkpoint import (load_checkpoint, save_checkpoint,
                                      validate_params)


# One fused device concat per dtype group; keyed on the leaf-structure so
# the trace is reused across epochs.
_concat_flat = jax.jit(lambda ls: jnp.concatenate([x.reshape(-1) for x in ls]))


def device_fetch_tree(tree):
    """Pytree of device arrays -> host numpy, via ONE device computation
    and one transfer per dtype group. The per-tensor `np.asarray` loop is
    pathological on tunneled transports: every fetch is a serialized
    round trip (237-tensor checkpoint measured ~120 s vs ~2 s packed)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    by_dt: Dict = {}
    for i, leaf in enumerate(leaves):
        by_dt.setdefault(jnp.dtype(leaf.dtype), []).append(i)
    out = [None] * len(leaves)
    for idxs in by_dt.values():
        group = [leaves[i] for i in idxs]
        if len(group) == 1:
            out[idxs[0]] = np.asarray(group[0])
            continue
        np_flat = np.asarray(_concat_flat(group))
        off = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape, dtype=np.int64)) if \
                leaves[i].shape else 1
            out[i] = np_flat[off:off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def flatten_opt_state(opt_state) -> Dict[str, np.ndarray]:
    leaves = device_fetch_tree(jax.tree_util.tree_leaves(opt_state))
    return {f"leaf{i:04d}": np.asarray(l) for i, l in enumerate(leaves)}


def unflatten_opt_state(template, flat: Dict[str, np.ndarray]):
    leaves = [flat[f"leaf{i:04d}"] for i in range(len(flat))]
    treedef = jax.tree_util.tree_structure(template)
    tmpl_leaves = jax.tree_util.tree_leaves(template)
    leaves = [jnp.asarray(l, tl.dtype) if hasattr(tl, "dtype") else l
              for l, tl in zip(leaves, tmpl_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_train_step(model, optimizer, args, with_metrics: bool = True) -> Callable:
    """Single-device jitted step:
    (params, opt_state, data, label) -> (params, opt_state, aux dict)."""

    # remat=True (default) checkpoints each AltFilter block -- required with
    # the XLA attention impls whose saved score activations OOM HBM. The
    # Pallas custom-VJP kernels save only (q, k, v, m, l), so
    # `--train_remat False` can skip the block-level forward recompute in
    # backward; A/B it per config (lft.forward's remat note).
    remat = getattr(args, "train_remat", True)
    # --train_fused: run each whole transformer block as ONE Pallas kernel
    # in forward AND backward (kernels/{spa,ang}_block.py custom VJPs).
    # auto = TPU + a half-precision-matmul dtype (bfloat16 or the shipping
    # `mixed`; the all-f32 backward's VMEM blocks don't fit the production
    # geometry). The forward itself gates on the block kernels' geometry
    # applicability and falls back to the remat'd unfused path when it
    # doesn't qualify -- so remat is passed through unchanged, NOT forced
    # off here (a geometry fallback must keep its HBM protection; fused
    # blocks themselves never consult remat). (ADVICE r4 item 2)
    tf = str(getattr(args, "train_fused", "auto")).lower()
    if tf == "auto":
        fused = (jax.devices()[0].platform == "tpu"
                 and str(getattr(args, "dtype", "float32"))
                 in ("bfloat16", "mixed"))
    else:
        fused = tf in ("true", "1", "yes")

    # pass only the optional keywords the model DECLARES (its ModelDef
    # capabilities) -- a second registered model without remat=/fused=
    # keywords must not TypeError here (ADVICE r4 item 1)
    kw = {}
    if "remat" in model.capabilities:
        kw["remat"] = remat
    if "fused" in model.capabilities:
        kw["fused"] = fused

    def loss_fn(params, data, label):
        # the fused Pallas kernels carry custom VJPs, so every impl
        # (incl. 'auto' -> pallas on TPU) is trainable
        sr = model.apply(params, data, args, **kw)
        return model.loss(sr, label), sr

    def step(params, opt_state, data, label):
        (loss, sr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, data, label)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux = {"loss": loss}
        if with_metrics:
            p, s = cal_metrics(label[:, 0], sr[:, 0], args.angRes)
            aux["psnr"] = p
            aux["ssim"] = s
        return params, opt_state, aux

    return jax.jit(step, donate_argnums=(0, 1))


def train_epoch(step_fn, params, opt_state, dataset, args, seed: int,
                put_batch=None, log=None) -> tuple:
    """One epoch over shuffled fixed-shape batches. Returns
    (params, opt_state, means dict). `--log_every N` prints per-iteration
    progress (the reference's tqdm role, train.py:117) without forcing a
    device sync unless it fires."""
    metrics_acc = []
    log_every = getattr(args, "log_every", 0) or 0
    for it, (data, label) in enumerate(iterate_batches(
            dataset, args.batch_size, shuffle=True, seed=seed,
            drop_last=True, num_workers=args.num_workers)):
        if put_batch is not None:
            data, label = put_batch(data, label)
        params, opt_state, aux = step_fn(params, opt_state, data, label)
        metrics_acc.append(aux)
        if log_every and log is not None and (it + 1) % log_every == 0:
            log("  iter %d: loss %.5f psnr %.3f" % (
                it + 1, float(aux["loss"]), float(aux.get("psnr", float("nan")))))
    means = {k: float(np.mean([float(a[k]) for a in metrics_acc]))
             for k in metrics_acc[0]} if metrics_acc else {}
    return params, opt_state, means


def fit(args, logger=None, step_builder=None, dataset: Optional[TrainDataset] = None,
        checkpoints_dir: Optional[str] = None, put_batch=None):
    """Full training run (reference train.py:10-108 equivalent).
    Returns (params, history)."""
    from lft_tpu.registry import get_model
    log = logger.log_string if logger else print
    model = get_model(args)
    dataset = dataset or TrainDataset(args, seed=args.seed)
    steps_per_epoch = max(len(dataset) // args.batch_size, 1)
    optimizer = make_optimizer(args, steps_per_epoch)

    # jit the init: unjitted, each of the ~237 param tensors is a separate
    # eager computation -- harmless locally, but ~0.5 s/op if a tunneled
    # transport later forces them one by one (checkpoint save)
    params = jax.jit(lambda key: model.init(key, args))(
        jax.random.PRNGKey(args.seed))
    opt_state = optimizer.init(params)
    start_epoch = 0
    if args.use_pre_pth:
        # unlike the reference's silent fallback (train.py:60-64), a broken
        # checkpoint path raises
        loaded, start_epoch, opt_flat = load_checkpoint(args.path_pre_pth)
        from lft_tpu.models.lft import param_shapes
        validate_params(loaded, param_shapes(args.channels, args.scale_factor))
        params = {k: jnp.asarray(v) for k, v in loaded.items()}
        if opt_flat:
            # exact resume: Adam moments + schedule step count restored
            opt_state = unflatten_opt_state(opt_state, opt_flat)
        else:
            # torch-format resume carries no optimizer state (the reference
            # silently restarts moments AND the LR schedule, SURVEY.md §3.5).
            # We restart moments (nothing else to do) but fast-forward the
            # schedule to the true epoch -- a deliberate fix of the
            # reference's schedule-reset quirk.
            opt_state = jax.tree_util.tree_map(
                lambda x: (jnp.asarray(start_epoch * steps_per_epoch, x.dtype)
                           if (hasattr(x, "ndim") and x.ndim == 0
                               and jnp.issubdtype(x.dtype, jnp.integer)) else x),
                opt_state)
        log("Use pretrain model!")

    step_fn = (step_builder or make_train_step)(model, optimizer, args)
    history = []
    for epoch in range(start_epoch, args.epoch):
        t0 = time.time()
        params, opt_state, means = train_epoch(
            step_fn, params, opt_state, dataset, args, seed=args.seed + epoch,
            put_batch=put_batch, log=log)
        dt = time.time() - t0
        log("The %dth Train, loss is: %.5f, psnr is %.5f, ssim is %.5f (%.1fs)"
            % (epoch + 1, means.get("loss", float("nan")),
               means.get("psnr", float("nan")), means.get("ssim", float("nan")), dt))
        history.append(means)
        if checkpoints_dir is not None and args.local_rank == 0:
            ext = "pth" if args.ckpt_format == "pth" else "npz"
            path = "%s/%s_%dx%d_%dx_epoch_%02d_model.%s" % (
                checkpoints_dir, args.model_name, args.angRes, args.angRes,
                args.scale_factor, epoch + 1, ext)
            np_params = device_fetch_tree(params)
            if ext == "pth":
                from lft_tpu.utils.checkpoint import params_to_pth
                params_to_pth(np_params, path, epoch=epoch + 1)
            else:
                save_checkpoint(path, np_params, epoch=epoch + 1,
                                opt_state_flat=flatten_opt_state(opt_state))
            log("Saving the epoch_%02d model at %s" % (epoch + 1, path))
    return params, history
