"""Device mesh + data-parallel training over ICI.

The reference's distribution story is vestigial `--local_rank` machinery
that never activates (no init_process_group / DDP anywhere; SURVEY.md §2.4).
The TPU-native replacement is explicit SPMD:

* a 1-D `('dp',)` `jax.sharding.Mesh` over the chips;
* the train step runs under `shard_map`: each chip computes grads on its
  batch shard, `jax.lax.pmean` over 'dp' all-reduces them across ICI, and
  the (replicated) Adam update is applied identically everywhere;
* the tiled-inference patch grid is sharded the same way (the patches are
  embarrassingly parallel).

Everything works identically on N real TPU chips or on N virtual CPU
devices (`--xla_force_host_platform_device_count`), which is how the test
suite exercises it (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from lft_tpu.ops.metrics import cal_metrics


def get_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), ("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_dp_train_step(model, optimizer, args, mesh: Mesh,
                       with_metrics: bool = True):
    """shard_map data-parallel train step.

    (params, opt_state, data [B,1,H,W], label) -> (params, opt_state, aux);
    `B` is the GLOBAL batch, sharded over 'dp'; params/opt_state replicated.
    Gradients are pmean'd over ICI; metrics are pmean'd too so logs match
    single-device semantics.
    """

    def loss_fn(params, data, label):
        # the fused Pallas kernels carry custom VJPs, so every impl
        # (incl. 'auto' -> pallas on TPU) is trainable
        sr = model.apply(params, data, args)
        return model.loss(sr, label), sr

    def shard_step(params, opt_state, data, label):
        (loss, sr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, data, label)
        grads = jax.lax.pmean(grads, "dp")          # all-reduce over ICI
        loss = jax.lax.pmean(loss, "dp")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux = {"loss": loss}
        if with_metrics:
            p, s = cal_metrics(label[:, 0], sr[:, 0], args.angRes)
            aux["psnr"] = jax.lax.pmean(p, "dp")
            aux["ssim"] = jax.lax.pmean(s, "dp")
        return params, opt_state, aux

    rep = P()
    sh = P("dp")
    # check_vma=False: with the new varying-manual-axes tracking, grads of
    # replicated params are (wrongly for this pattern) marked invariant, so
    # the explicit pmean no-ops and an implicit psum is inserted at the
    # out_specs boundary -> 8x gradients. Classic semantics do what we wrote.
    mapped = shard_map(
        shard_step, mesh=mesh,
        in_specs=(rep, rep, sh, sh),
        out_specs=(rep, rep, rep),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0, 1))


def make_dp_step_builder(mesh: Mesh):
    """Adapter for lft_tpu.training.trainer.fit(step_builder=...)."""
    def builder(model, optimizer, args, with_metrics: bool = True):
        return make_dp_train_step(model, optimizer, args, mesh, with_metrics)
    return builder


def put_global_batch(mesh: Mesh, data: np.ndarray, label: np.ndarray):
    """Host numpy batch -> global jax arrays sharded over 'dp'."""
    sh = batch_sharding(mesh)
    return (jax.device_put(data, sh), jax.device_put(label, sh))
