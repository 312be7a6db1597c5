"""Full-scene tiled super-resolution: one compiled pipeline.

The reference runs `LFdivide -> (python loop, batch=1, per-patch forward)
-> LFintegrate` on the host (reference test.py:83-99) -- its headline
inefficiency. Here the whole thing is a single jit region per scene
geometry: divide (gather), a `lax.map` over fixed-size patch chunks through
the network (so compile happens once and VMEM stays bounded), integrate
(reshape), and optional on-device PSNR/SSIM. Scene shapes are static per
compile; distinct scene sizes each get one cached compile.

Multi-chip: `sharded=True` shards the patch-chunk axis across a `dp` device
mesh (the patch grid is embarrassingly parallel, SURVEY.md §2.4(b)).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from lft_tpu.ops.tiling import lf_divide, lf_integrate, tiling_grid, views_4d_to_mosaic


def make_scene_sr(model_apply, args, h0: int, w0: int,
                  eval_batch: Optional[int] = None, mesh=None,
                  n_scenes: int = 1):
    """Build a jitted `scene_sr(params, lr_mosaic [A*h0, A*w0]) -> sr mosaic
    [A*h0*S, A*w0*S]` for one scene geometry.

    The patch grid is split into full `eval_batch`-size chunks run under
    `lax.map` (bounded VMEM, one trace) plus ONE remainder chunk of the
    leftover patches -- no zero-padding waste: every patch the model runs is
    a real patch (a 7x7 grid at eval_batch=16 previously computed 64 patch
    slots for 49 real patches). With `mesh`, the patch axis of each chunk is
    sharding-constrained over 'dp' so chips split the grid (the remainder is
    padded only up to the device count).

    `n_scenes > 1` batches several same-geometry scenes through ONE jit
    call (`[N, A*h0, A*w0] -> [N, A*h0*S, A*w0*S]`): their patch grids
    concatenate along the chunk axis, so the per-dispatch overhead of the
    device transport AND the remainder-chunk recompile amortize N ways --
    the 128^2-scene workload is dispatch-bound otherwise (~29 ms/dispatch
    on this host's tunneled TPU, docs/PERFORMANCE.md)."""
    A = args.angRes
    S = args.scale_factor
    patch = args.patch_size_for_test
    stride = args.stride_for_test
    g = tiling_grid(h0, w0, patch, stride)
    n_patches = g["numU"] * g["numV"] * n_scenes
    eb = min(eval_batch or args.eval_batch, n_patches)
    ndev = mesh.devices.size if mesh is not None else 1
    if mesh is not None:
        eb = max(eb // ndev, 1) * ndev  # chunk divisible across devices
    n_main = (n_patches // eb) * eb
    rem = n_patches - n_main
    rem_pad = (-rem) % ndev if rem else 0

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        patch_sh = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())

    # inference never needs rematerialization (see lft.forward's remat
    # note) and, on real TPUs, runs each transformer block as one fused
    # Pallas kernel (kernels/{spa,ang}_block.py). Gated on the model's
    # DECLARED capabilities (ModelDef.capabilities), not signature
    # sniffing: a second registered model accepting **kw must not
    # silently inherit LFT's fast-path flags.
    from lft_tpu.registry import capabilities_of
    caps = capabilities_of(model_apply)
    no_remat = {}
    if "remat" in caps:
        no_remat["remat"] = False
    if "fused" in caps and jax.devices()[0].platform == "tpu":
        no_remat["fused"] = True

    def run_chunk(params, chunk):
        if mesh is not None:
            chunk = jax.lax.with_sharding_constraint(chunk, patch_sh)
        return model_apply(params, chunk, args, **no_remat)

    def pipeline(params, lr_mosaic):
        lr_s = lr_mosaic if n_scenes > 1 else lr_mosaic[None]
        sub = jax.vmap(lambda m: lf_divide(m, A, patch, stride))(lr_s)
        flat = sub.reshape(n_patches, 1, A * patch, A * patch)
        outs = []
        if n_main:
            chunks = flat[:n_main].reshape(n_main // eb, eb, 1,
                                           A * patch, A * patch)
            o = jax.lax.map(lambda c: run_chunk(params, c), chunks)
            outs.append(o.reshape(n_main, A * patch * S, A * patch * S))
        if rem:
            r_in = flat[n_main:]
            if rem_pad:
                r_in = jnp.pad(r_in, [(0, rem_pad), (0, 0), (0, 0), (0, 0)])
            o = run_chunk(params, r_in)
            outs.append(o.reshape(rem + rem_pad,
                                  A * patch * S, A * patch * S)[:rem])
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        out = out.reshape(n_scenes, g["numU"], g["numV"],
                          A * patch * S, A * patch * S)
        views = jax.vmap(lambda o_: lf_integrate(
            o_, A, patch * S, stride * S, h0 * S, w0 * S))(out)
        mos = jax.vmap(views_4d_to_mosaic)(views)
        return mos if n_scenes > 1 else mos[0]

    # Small-channel configs can hit XLA's scoped-VMEM ceiling on real TPUs:
    # inside the lax.map while body XLA stack-allocates a Pallas kernel's
    # [views, h, w, E] output in VMEM when it fits (~13 MB at c16/f32),
    # leaving less than the attention kernel's own scratch needs under the
    # default 16 MB limit. Raise the limit for this jit only; harmless
    # where the default sufficed.
    opts = ({"xla_tpu_scoped_vmem_limit_kib": 24 * 1024}
            if jax.devices()[0].platform == "tpu" else None)
    if mesh is not None:
        return jax.jit(pipeline, in_shardings=(rep, rep), out_shardings=rep,
                       compiler_options=opts)
    return jax.jit(pipeline, compiler_options=opts)


def _bucketed_size(n: int, need: int, bucket: int) -> int:
    return -(-(n + need) // bucket) * bucket


class ScenePipelineCache:
    """Caches one compiled pipeline per (h0, w0) scene geometry -- the five
    benchmark datasets have a handful of distinct scene sizes, so steady-
    state evaluation never recompiles.

    `bucket > 0` additionally rounds scene geometry up to multiples of
    `bucket` LR pixels (SURVEY.md §7 hard-part (d)): a multi-dataset sweep
    then compiles O(buckets) pipelines instead of O(distinct sizes). Outputs
    are identical to the unbucketed pipeline: the scene is extended with the
    exact symmetric-then-zero pattern the tiling would produce past the true
    boundary (mirror for `bdr` pixels -- what `lf_divide`'s ImageExtend halo
    yields -- then zeros, matching its `hE/wE` extension), sized so every
    patch whose central crop reaches the real output reads identical input;
    the extra patches below/right are computed and discarded.
    """

    def __init__(self, model_apply, args, eval_batch: Optional[int] = None,
                 mesh=None, bucket: Optional[int] = None,
                 scene_batch: Optional[int] = None):
        self.model_apply = model_apply
        self.args = args
        self.eval_batch = eval_batch
        self.mesh = mesh
        # None / negative = auto: on real TPUs default to the bench-grade
        # configuration (scene batching + bucketing won the round-3
        # dispatch-amortization gains and both are output-identical); off
        # elsewhere. Explicit 0/1 still mean "disabled".
        on_tpu = jax.devices()[0].platform == "tpu"
        if bucket is None or bucket < 0:
            bucket = 32 if on_tpu else 0
        if scene_batch is None or scene_batch < 0:
            scene_batch = 8 if on_tpu else 1
        self.bucket = bucket or 0
        self.scene_batch = max(scene_batch, 1)
        self._cache = {}

    def _pipeline(self, h0: int, w0: int, n: int = 1):
        if (h0, w0, n) not in self._cache:
            self._cache[(h0, w0, n)] = make_scene_sr(
                self.model_apply, self.args, h0, w0, self.eval_batch,
                self.mesh, n_scenes=n)
        return self._cache[(h0, w0, n)]

    def __call__(self, params, lr_mosaic: jnp.ndarray) -> jnp.ndarray:
        return self.run_batch(params, [lr_mosaic])[0]

    def run_batch(self, params, lr_mosaics) -> list:
        """SR a group of SAME-SHAPE scenes through one jit dispatch
        (`make_scene_sr(n_scenes=N)`); returns one SR mosaic per input.
        Composes with bucketing: each scene is extended to the bucket
        geometry first (cheap device-side pads), so mixed-size groups
        whose buckets agree still share the dispatch."""
        A = self.args.angRes
        S = self.args.scale_factor
        n = len(lr_mosaics)
        shapes = {tuple(m.shape) for m in lr_mosaics}
        if len(shapes) != 1:
            raise ValueError(f"run_batch needs same-shape scenes, got {shapes}")
        H, W = lr_mosaics[0].shape
        h0, w0 = H // A, W // A
        patch = self.args.patch_size_for_test
        stride = self.args.stride_for_test
        bdr = (patch - stride) // 2
        # a kept patch's input window reaches at most `patch - bdr` past the
        # scene edge; content up to there must match the unbucketed tiling
        need = patch - bdr
        if not self.bucket:
            pipe = self._pipeline(h0, w0, n)
            if n == 1:
                return [pipe(params, lr_mosaics[0])]
            sr = pipe(params, jnp.stack(lr_mosaics))
            return list(sr)
        if (patch - stride) % 2:
            # the base tiling itself truncates one output row/col per view
            # for odd patch-stride (reference utils/utils.py:141-157 has the
            # same asymmetry); the bucketed unpack reshape would then fail
            # with an opaque shape error -- reject the config explicitly
            raise ValueError(
                f"bucketed eval requires even patch_size_for_test - "
                f"stride_for_test, got {patch} - {stride}")
        h0b = _bucketed_size(h0, need, self.bucket)
        w0b = _bucketed_size(w0, need, self.bucket)

        def ext_one(lr_mosaic):
            views = lr_mosaic.reshape(A, h0, A, w0).transpose(0, 2, 1, 3)
            ext = jnp.pad(views, [(0, 0), (0, 0), (0, bdr), (0, bdr)],
                          mode="symmetric")
            ext = jnp.pad(ext, [(0, 0), (0, 0), (0, h0b - h0 - bdr),
                                (0, w0b - w0 - bdr)])
            return views_4d_to_mosaic(ext)

        pipe = self._pipeline(h0b, w0b, n)
        if n == 1:
            sr_bs = [pipe(params, ext_one(lr_mosaics[0]))]
        else:
            sr_bs = list(pipe(params, jnp.stack(
                [ext_one(m) for m in lr_mosaics])))

        def crop_one(sr_b):
            sr_views = sr_b.reshape(A, h0b * S, A, w0b * S).transpose(
                0, 2, 1, 3)
            return views_4d_to_mosaic(sr_views[:, :, :h0 * S, :w0 * S])

        return [crop_one(s) for s in sr_bs]


def evaluate_dataset(model_apply, params, args, dataset, cache=None,
                     metrics_fn=None, log=print, prefetch=True):
    """test.py-equivalent per-dataset sweep: tiled SR of every scene +
    PSNR/SSIM against HR (reference test.py:73-111). Returns
    (psnr_mean, ssim_mean, per_scene list).

    With `prefetch` (default), scene i+1's host read + host->device
    transfer runs on a background thread while scene i computes -- the
    role the reference's DataLoader workers play (utils_datasets.py:50-64),
    double-buffered instead of queued. Matters on real datasets: a 5x5
    f32 scene is tens of MB and this host's device transfers are slow."""
    import concurrent.futures as _fut
    from lft_tpu.ops.metrics import cal_metrics
    cache = cache or ScenePipelineCache(
        model_apply, args, eval_batch=getattr(args, "eval_batch", None),
        bucket=getattr(args, "eval_bucket", None),
        scene_batch=getattr(args, "scene_batch", None))
    n = len(dataset)
    sb = getattr(cache, "scene_batch", 1) or 1

    # Sweep same-shape scenes together: a flush-on-shape-change sweep over
    # a mixed-size dataset in arbitrary order degrades to scene_batch=1
    # (VERDICT r4 weak-item 5). Grouping only reorders the sweep -- every
    # scene's SR and metrics are per-scene and identical; per_scene is
    # restored to dataset order below. Shapes come from the h5 header
    # (`scene_shape`), no pixel reads.
    order = list(range(n))
    if sb > 1 and n > 1 and hasattr(dataset, "scene_shape"):
        order.sort(key=lambda i: (dataset.scene_shape(i), i))

    def load(i):
        lr, hr = dataset[i]
        return jnp.asarray(lr), jnp.asarray(hr)

    psnrs, ssims = [], []
    per_scene_idx = []  # (dataset index, name, psnr, ssim)
    pending = []  # [(i, lr, hr)] same-shape group awaiting one dispatch

    def flush():
        if not pending:
            return
        srs = cache.run_batch(params, [lr for _, lr, _ in pending]) \
            if hasattr(cache, "run_batch") else \
            [cache(params, lr) for _, lr, _ in pending]
        for (i, _, hr), sr in zip(pending, srs):
            p, s = (metrics_fn or cal_metrics)(hr, sr, args.angRes)
            p, s = float(p), float(s)
            psnrs.append(p)
            ssims.append(s)
            name = (dataset.scene_name(i)
                    if hasattr(dataset, "scene_name") else str(i))
            per_scene_idx.append((i, name, p, s))
        pending.clear()

    ex = _fut.ThreadPoolExecutor(max_workers=1) if (prefetch and n > 1) \
        else None
    try:
        nxt = ex.submit(load, order[0]) if ex else None
        for pos, i in enumerate(order):
            lr, hr = nxt.result() if ex else load(i)
            if ex and pos + 1 < n:
                nxt = ex.submit(load, order[pos + 1])
            if pending and pending[-1][1].shape != lr.shape:
                flush()  # shape change ends the group early
            pending.append((i, lr, hr))
            if len(pending) >= sb:
                flush()
        flush()
    finally:
        if ex:
            # join the worker: shutdown(wait=False) would abandon an
            # in-flight load() whose h5 handle stays open if the pipeline
            # raised mid-sweep (cancel_futures drops anything still queued)
            ex.shutdown(wait=True, cancel_futures=True)
    per_scene = [(name, p, s)
                 for _, name, p, s in sorted(per_scene_idx)]
    return float(np.mean(psnrs)), float(np.mean(ssims)), per_scene
