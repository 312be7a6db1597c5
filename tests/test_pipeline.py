"""End-to-end tests: synthetic data -> loaders -> training -> tiled
inference -> CLI drivers, plus multi-device data parallelism on the 8
virtual CPU devices (SURVEY.md §4)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lft_tpu.config import Args
from lft_tpu.data.datasets import (TestDataset, TrainDataset, augmentation,
                                   iterate_batches, multi_test_sets)
from lft_tpu.data.synth import make_synth_data, synth_lf_scene
from lft_tpu.inference.tiled import ScenePipelineCache
from lft_tpu.ops.tiling import lf_divide, lf_integrate, views_4d_to_mosaic
from lft_tpu.registry import get_model


@pytest.fixture(scope="session")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    paths = make_synth_data(str(root), ang_res=5, scale=2, n_train=4, n_test=1,
                            train_patch=16, test_hw=32)
    return paths


def _args(synth_root, **kw):
    base = dict(angRes=5, scale_factor=2, channels=8, batch_size=2,
                num_workers=0, epoch=1, eval_batch=4,
                path_for_train=synth_root["path_for_train"],
                path_for_test=synth_root["path_for_test"],
                data_name=synth_root["data_name"])
    base.update(kw)
    return Args(**base)


# ------------------------------------------------------------------ data ---

def test_synth_dataset_loaders(synth_root):
    args = _args(synth_root)
    train = TrainDataset(args, seed=0)
    assert len(train) == 4
    data, label = train[0]
    assert data.shape == (1, 5 * 16, 5 * 16)
    assert label.shape == (1, 5 * 32, 5 * 32)
    assert data.dtype == np.float32

    names, sets, total = multi_test_sets(args)
    assert names == [synth_root["data_name"]] and total == 1
    lr, hr = sets[0][0]
    assert lr.shape == (5 * 32, 5 * 32)
    assert hr.shape == (5 * 64, 5 * 64)
    # LR must be a downscale of HR: correlation sanity
    assert np.corrcoef(lr[:32, :32].ravel(),
                       hr[:64:2, :64:2].ravel())[0, 1] > 0.8


def test_data_name_all_multi_dataset(tmp_path):
    """--data_name ALL must sweep every dataset directory (reference
    MultiTestSetDataLoader, utils/utils_datasets.py:50-64) and pool
    training files across datasets (TrainSetDataLoader, :14-33)."""
    pa = make_synth_data(str(tmp_path), ang_res=5, scale=2, n_train=2,
                         n_test=1, train_patch=16, test_hw=32,
                         dataset_name="SynthA", seed=1)
    make_synth_data(str(tmp_path), ang_res=5, scale=2, n_train=3,
                    n_test=2, train_patch=16, test_hw=32,
                    dataset_name="SynthB", seed=2)
    args = Args(angRes=5, scale_factor=2, channels=8, data_name="ALL",
                path_for_train=pa["path_for_train"],
                path_for_test=pa["path_for_test"])
    names, sets, total = multi_test_sets(args)
    assert names == ["SynthA", "SynthB"]
    assert [len(s) for s in sets] == [1, 2] and total == 3
    train = TrainDataset(args, seed=0)
    assert len(train) == 5          # 2 + 3 pooled across datasets
    # single-name selection still narrows to one dataset
    args_b = Args(angRes=5, scale_factor=2, channels=8, data_name="SynthB",
                  path_for_train=pa["path_for_train"],
                  path_for_test=pa["path_for_test"])
    names_b, sets_b, total_b = multi_test_sets(args_b)
    assert names_b == ["SynthB"] and total_b == 2
    assert len(TrainDataset(args_b, seed=0)) == 3


def test_test_loader_transpose_semantics(synth_root):
    """Test loader must transpose (1,0) to undo Matlab column-major storage
    (reference utils/utils_datasets.py:89-90); train loader must NOT."""
    import h5py
    args = _args(synth_root)
    tds = TestDataset(args, synth_root["data_name"])
    raw_path = os.path.join(tds.dataset_dir, tds.file_list[0])
    with h5py.File(raw_path, "r") as f:
        raw = np.array(f["Lr_SAI_y"])
    lr, _ = tds[0]
    np.testing.assert_array_equal(lr, raw.transpose(1, 0))
    train = TrainDataset(args, seed=None)
    train.rng = __import__("random").Random(1)  # force no-aug path check below


def test_seeded_batches_reproducible_under_prefetch(synth_root):
    """Two seeded epochs must produce bitwise-identical batches regardless
    of num_workers: the per-item (seed, index) augmentation rng makes
    prefetch-thread scheduling irrelevant (the reference's worker-seeded
    DataLoader semantics, reference train.py:26-27)."""
    args = _args(synth_root)
    train = TrainDataset(args, seed=7)

    def epoch(num_workers):
        return [(d.copy(), l.copy()) for d, l in iterate_batches(
            train, batch_size=2, shuffle=True, seed=123,
            num_workers=num_workers)]

    a = epoch(2)
    b = epoch(2)
    c = epoch(0)
    assert len(a) == len(b) == len(c) == 2
    for (da, la), (db, lb), (dc, lc) in zip(a, b, c):
        np.testing.assert_array_equal(da, db)
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(da, dc)
        np.testing.assert_array_equal(la, lc)


def test_augmentation_ops():
    import random as _random
    rng = _random.Random(0)
    d = np.arange(16, dtype=np.float32).reshape(4, 4)
    l = np.arange(64, dtype=np.float32).reshape(8, 8)
    d2, l2 = augmentation(d, l, rng)
    assert d2.shape == (4, 4) and l2.shape == (8, 8)
    # deterministic given the seed; flips/transposes preserve multisets
    assert sorted(d2.ravel()) == sorted(d.ravel())


def test_iterate_batches_fixed_shapes(synth_root):
    args = _args(synth_root)
    ds = TrainDataset(args, seed=0)
    batches = list(iterate_batches(ds, 2, shuffle=True, seed=0, num_workers=2))
    assert len(batches) == 2
    for d, l in batches:
        assert d.shape == (2, 1, 80, 80) and l.shape == (2, 1, 160, 160)


# ------------------------------------------------------- tiled inference ---

@pytest.mark.slow
def test_tiled_pipeline_matches_patch_loop(synth_root):
    """The one-jit pipeline must equal the reference-style serial loop:
    divide -> per-patch forward -> integrate (reference test.py:83-99)."""
    args = _args(synth_root)
    model = get_model(args)
    params = model.init(jax.random.PRNGKey(0), args)
    _, sets, _ = (lambda a: multi_test_sets(a))(args)
    lr, hr = sets[0][0]

    cache = ScenePipelineCache(model.apply, args, eval_batch=3)  # non-dividing
    sr_pipeline = np.asarray(cache(params, jnp.asarray(lr)))

    A, p, s = args.angRes, args.patch_size_for_test, args.stride_for_test
    S = args.scale_factor
    h0, w0 = lr.shape[0] // A, lr.shape[1] // A
    sub = lf_divide(jnp.asarray(lr), A, p, s)
    nU, nV = sub.shape[:2]
    outs = np.zeros((nU, nV, A * p * S, A * p * S), np.float32)
    for u in range(nU):
        for v in range(nV):
            o = model.apply(params, sub[u, v][None, None], args)
            outs[u, v] = np.asarray(o)[0, 0]
    views = lf_integrate(jnp.asarray(outs), A, p * S, s * S, h0 * S, w0 * S)
    sr_loop = np.asarray(views_4d_to_mosaic(views))
    np.testing.assert_allclose(sr_pipeline, sr_loop, atol=2e-5)


# ---------------------------------------------------------------- training ---

@pytest.mark.slow
def test_train_step_and_resume(synth_root, tmp_path):
    from lft_tpu.training.trainer import fit
    args = _args(synth_root, epoch=1)
    params, history = fit(args, checkpoints_dir=str(tmp_path))
    assert np.isfinite(history[0]["loss"])
    assert history[0]["psnr"] > 0
    ckpt = tmp_path / "LFT_5x5_2x_epoch_01_model.npz"
    assert ckpt.exists()
    # resume for one more epoch from the checkpoint (exact opt-state restore)
    args2 = _args(synth_root, epoch=2, use_pre_pth=True,
                  path_pre_pth=str(ckpt))
    params2, history2 = fit(args2, checkpoints_dir=str(tmp_path))
    assert len(history2) == 1  # ran only epoch 2
    assert np.isfinite(history2[0]["loss"])


def test_steplr_schedule():
    from lft_tpu.training.optim import step_lr_schedule
    sched = step_lr_schedule(2e-4, 0.5, n_steps_epochs=15, steps_per_epoch=10)
    assert sched(0) == 2e-4
    assert sched(149) == 2e-4             # epoch 14
    assert sched(150) == pytest.approx(1e-4)   # epoch 15
    assert sched(450) == pytest.approx(0.25e-4)  # epoch 45


# ------------------------------------------------------------ parallelism ---

@pytest.mark.slow
def test_dp_training_matches_single_device():
    """shard_map DP over 8 virtual devices must reproduce single-device
    training numerics (same global batch). Runs in a fresh subprocess: the
    XLA CPU runtime can abort when the shard_map step runs after many other
    compiled programs in one process, and a clean runtime also matches how
    the multi-chip path is actually launched (see tests/_dp_check.py)."""
    import subprocess
    import sys
    script = os.path.join(os.path.dirname(__file__), "_dp_check.py")
    cmd = [sys.executable, script]
    if hasattr(os, "nice") and os.geteuid() == 0:
        # XLA's CPU collective rendezvous hard-terminates after 40 s; on a
        # 1-core CI host the parent suite can starve one device thread past
        # that. Boost the child's priority when we can.
        cmd = ["nice", "-n", "-10"] + cmd
    res = None
    for _ in range(2):  # one retry: the rendezvous timeout is wall-clock
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=540)
        if res.returncode == 0:
            break
    assert res.returncode == 0, res.stdout + res.stderr
    assert "DP == single-device: OK" in res.stdout


@pytest.mark.slow
def test_multihost_training_matches_single_process(tmp_path):
    """The multi-host entry (--coordinator/--num_processes/--process_id,
    lft_tpu/parallel/distributed.py) over 2 processes x 2 virtual CPU
    devices must reproduce single-process 4-device DP training: same
    loss, near-identical checkpoint params (see tests/_dist_check.py)."""
    import socket
    import subprocess
    import sys
    from lft_tpu.data.synth import make_synth_data
    make_synth_data(str(tmp_path / "data"), ang_res=5, scale=2, n_train=4,
                    n_test=1, train_patch=16, test_hw=32)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = os.path.join(os.path.dirname(__file__), "_dist_check.py")
    out = str(tmp_path / "out")
    single = subprocess.run(
        [sys.executable, script, "single", str(tmp_path / "data"), out],
        capture_output=True, text=True, timeout=540)
    assert single.returncode == 0, single.stdout + single.stderr
    workers = [subprocess.Popen(
        [sys.executable, script, "worker", str(port), str(pid),
         str(tmp_path / "data"), out],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = [w.communicate(timeout=540)[0] for w in workers]
    assert all(w.returncode == 0 for w in workers), "\n".join(outs)
    ck = "SR_5x5_2x/LFT/SynthLF/checkpoints/LFT_5x5_2x_epoch_01_model.npz"
    a = np.load(os.path.join(out, "single", ck))
    b = np.load(os.path.join(out, "p0", ck))
    assert not os.path.exists(os.path.join(out, "p1", ck)), \
        "only process 0 may write checkpoints"
    for k in a.files:
        if a[k].dtype.kind == "f":
            np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)


@pytest.mark.slow  # ~109 s: two full pipeline compiles x two scene sizes
def test_bucketed_eval_matches_exact():
    """Scene-size bucketing must change compile count, not outputs
    (SURVEY.md §7 hard-part (d); VERDICT.md round-1 #8). Two scene sizes in
    one bucket -> one compiled pipeline, bit-matching the exact-size path."""
    args = Args(angRes=5, scale_factor=2, channels=8,
                patch_size_for_test=8, stride_for_test=4, eval_batch=4)
    model = get_model(args)
    params = model.init(jax.random.PRNGKey(0), args)
    exact = ScenePipelineCache(model.apply, args, eval_batch=4)
    bucketed = ScenePipelineCache(model.apply, args, eval_batch=4, bucket=16)
    rng = np.random.RandomState(11)
    for h0, w0 in [(10, 12), (9, 11)]:  # both round up to the same bucket
        scene = jnp.asarray(rng.rand(5 * h0, 5 * w0).astype(np.float32))
        np.testing.assert_allclose(np.asarray(bucketed(params, scene)),
                                   np.asarray(exact(params, scene)),
                                   atol=1e-6)
    assert len(bucketed._cache) == 1, "bucketing must reuse one pipeline"
    assert len(exact._cache) == 2


@pytest.mark.slow  # ~62 s: batched + bucketed + dataset-eval pipeline compiles
def test_scene_batched_eval_matches_per_scene(tmp_path):
    """Scene batching (several same-geometry scenes per jit dispatch,
    `make_scene_sr(n_scenes=N)` / `ScenePipelineCache(scene_batch=N)`)
    must be output-identical to per-scene dispatches -- plain AND
    composed with bucketing -- and `evaluate_dataset` must produce the
    same rows through a batching cache."""
    from lft_tpu.inference.tiled import evaluate_dataset
    args = Args(angRes=5, scale_factor=2, channels=8,
                patch_size_for_test=8, stride_for_test=4, eval_batch=4)
    model = get_model(args)
    params = model.init(jax.random.PRNGKey(0), args)
    single = ScenePipelineCache(model.apply, args, eval_batch=4)
    batched = ScenePipelineCache(model.apply, args, eval_batch=4,
                                 scene_batch=3)
    rng = np.random.RandomState(3)
    scenes = [jnp.asarray(rng.rand(5 * 12, 5 * 12).astype(np.float32))
              for _ in range(3)]
    outs = batched.run_batch(params, scenes)
    for sc, out in zip(scenes, outs):
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(single(params, sc)), atol=1e-6)
    # composed with bucketing: two sizes, one bucket, one (batched) pipeline
    b_single = ScenePipelineCache(model.apply, args, eval_batch=4, bucket=16)
    b_batch = ScenePipelineCache(model.apply, args, eval_batch=4, bucket=16,
                                 scene_batch=2)
    pair = [jnp.asarray(rng.rand(5 * 10, 5 * 12).astype(np.float32))
            for _ in range(2)]
    for sc, out in zip(pair, b_batch.run_batch(params, pair)):
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(b_single(params, sc)),
                                   atol=1e-6)
    assert len(b_batch._cache) == 1
    # evaluate_dataset through a batching cache: same rows, same order
    paths = make_synth_data(str(tmp_path), ang_res=5, scale=2, n_train=0,
                            n_test=3, test_hw=16, seed=9)
    eargs = Args(angRes=5, scale_factor=2, channels=8, eval_batch=4,
                 patch_size_for_test=8, stride_for_test=4,
                 path_for_test=paths["path_for_test"],
                 data_name=paths["data_name"])
    _, sets, _ = multi_test_sets(eargs)
    emodel = get_model(eargs)
    eparams = emodel.init(jax.random.PRNGKey(0), eargs)
    base = evaluate_dataset(emodel.apply, eparams, eargs, sets[0])
    via_batch = evaluate_dataset(
        emodel.apply, eparams, eargs, sets[0],
        cache=ScenePipelineCache(emodel.apply, eargs, scene_batch=2))
    assert base[2] == via_batch[2]


def test_evaluate_dataset_prefetch_parity(tmp_path):
    """Double-buffered scene prefetch (background-thread load + H2D,
    inference/tiled.py) must not change evaluation results or order."""
    from lft_tpu.inference.tiled import evaluate_dataset
    paths = make_synth_data(str(tmp_path), ang_res=5, scale=2, n_train=0,
                            n_test=3, test_hw=16, seed=5)
    args = Args(angRes=5, scale_factor=2, channels=8, eval_batch=4,
                patch_size_for_test=8, stride_for_test=4,
                path_for_test=paths["path_for_test"],
                data_name=paths["data_name"])
    _, sets, _ = multi_test_sets(args)
    model = get_model(args)
    params = model.init(jax.random.PRNGKey(0), args)
    p1, s1, rows1 = evaluate_dataset(model.apply, params, args, sets[0],
                                     prefetch=True)
    p2, s2, rows2 = evaluate_dataset(model.apply, params, args, sets[0],
                                     prefetch=False)
    assert rows1 == rows2
    assert (p1, s1) == (p2, s2)


@pytest.mark.slow
def test_sharded_eval_matches_unsharded():
    """Patch-grid-sharded tiled inference over an 8-virtual-device mesh must
    reproduce the single-device pipeline (the TPU answer to the reference's
    serial patch loop, test.py:88-95; VERDICT.md Missing #4)."""
    from lft_tpu.inference.tiled import make_scene_sr
    from lft_tpu.parallel.mesh import get_mesh

    args = Args(angRes=5, scale_factor=2, channels=8,
                patch_size_for_test=8, stride_for_test=4, eval_batch=8)
    model = get_model(args)
    params = model.init(jax.random.PRNGKey(0), args)
    scene = jnp.asarray(
        np.random.RandomState(7).rand(5 * 16, 5 * 16).astype(np.float32))

    sr_single = np.asarray(
        make_scene_sr(model.apply, args, 16, 16)(params, scene))
    mesh = get_mesh(8)
    sr_sharded = np.asarray(
        make_scene_sr(model.apply, args, 16, 16, mesh=mesh)(params, scene))
    assert sr_single.shape == sr_sharded.shape == (5 * 32, 5 * 32)
    np.testing.assert_allclose(sr_sharded, sr_single, atol=2e-6)

    # scene batching composes with the sharded patch axis: two scenes per
    # dispatch over the same 8-device mesh, still output-identical
    scene2 = jnp.asarray(np.stack([np.asarray(scene),
                                   np.asarray(scene)[::-1, ::-1].copy()]))
    sr_b = np.asarray(make_scene_sr(model.apply, args, 16, 16, mesh=mesh,
                                    n_scenes=2)(params, scene2))
    np.testing.assert_allclose(sr_b[0], sr_single, atol=2e-6)
    sr_flip = np.asarray(
        make_scene_sr(model.apply, args, 16, 16)(params, scene2[1]))
    np.testing.assert_allclose(sr_b[1], sr_flip, atol=2e-6)


# ------------------------------------------------------------------- CLI ---

@pytest.mark.slow
def test_cli_train_then_test(synth_root, tmp_path):
    import train as train_cli
    import test as test_cli
    args = _args(synth_root, epoch=1, path_log=str(tmp_path / "log") + os.sep)
    params, history = train_cli.main(args)
    ckpts = list((tmp_path / "log").rglob("*.npz"))
    assert len(ckpts) == 1
    args2 = _args(synth_root, use_pre_pth=True, path_pre_pth=str(ckpts[0]),
                  path_log=str(tmp_path / "log") + os.sep)
    psnrs, ssims = test_cli.main(args2)
    assert len(psnrs) == 1 and np.isfinite(psnrs[0]) and psnrs[0] > 0
    # log file exists with reference-style lines
    logs = list((tmp_path / "log").rglob("LFT.txt"))
    assert logs and "Test on" in logs[0].read_text()


@pytest.mark.slow
def test_cli_profile_dir_smoke(synth_root, tmp_path):
    """--profile_dir must produce a non-empty jax.profiler trace and not
    break training (VERDICT.md Weak #7)."""
    import train as train_cli
    prof = tmp_path / "trace"
    args = _args(synth_root, epoch=1, path_log=str(tmp_path / "log") + os.sep,
                 profile_dir=str(prof))
    train_cli.main(args)
    assert prof.exists() and any(prof.rglob("*")), "empty profiler trace"


def test_device_synth_batch():
    """On-device synthetic LF stream: shapes + LR is a downscale of HR."""
    from lft_tpu.data.device_synth import synth_batch
    lr, hr = synth_batch(jax.random.PRNGKey(0), batch=2, ang_res=5,
                         patch=16, scale=2)
    assert lr.shape == (2, 1, 80, 80) and hr.shape == (2, 1, 160, 160)
    l = np.asarray(lr)[0, 0, :16, :16]
    h = np.asarray(hr)[0, 0, :32:2, :32:2]
    assert np.corrcoef(l.ravel(), h.ravel())[0, 1] > 0.8
    assert float(lr.min()) > -0.5 and float(lr.max()) < 1.5


def test_cosine_schedule_flag():
    from lft_tpu.training.optim import cosine_schedule, make_optimizer
    sched = cosine_schedule(2e-4, total_epochs=10, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(2e-4)
    assert float(sched(50)) == pytest.approx(1e-4, rel=1e-3)   # half-way
    assert float(sched(100)) < 1e-8
    args = Args(lr_schedule="cosine", epoch=10)
    make_optimizer(args, steps_per_epoch=10)  # constructs without error


@pytest.mark.slow  # ~55 s: two full train-step compiles
def test_train_step_remat_flag_parity():
    """`--train_remat False` must change memory/FLOP strategy only, never
    the math: one step with and without block rematerialization produces
    the same updated params (remat recompute is exact)."""
    from lft_tpu.data.device_synth import synth_batch
    from lft_tpu.training.optim import make_optimizer
    from lft_tpu.training.trainer import make_train_step
    lr_b, hr_b = synth_batch(jax.random.PRNGKey(1), batch=2, ang_res=5,
                             patch=8, scale=2)
    outs = {}
    for remat in (True, False):
        args = Args(angRes=5, scale_factor=2, channels=8, batch_size=2,
                    train_remat=remat)
        model = get_model(args)
        params = model.init(jax.random.PRNGKey(0), args)
        optimizer = make_optimizer(args, steps_per_epoch=10)
        opt_state = optimizer.init(params)
        step = make_train_step(model, optimizer, args, with_metrics=False)
        new_params, _, aux = step(params, opt_state, lr_b, hr_b)
        outs[remat] = (jax.device_get(new_params), float(aux["loss"]))
    assert abs(outs[True][1] - outs[False][1]) < 1e-6
    for k in outs[True][0]:
        np.testing.assert_allclose(outs[True][0][k], outs[False][0][k],
                                   atol=2e-6, err_msg=k)


def test_evaluate_dataset_groups_mixed_shapes():
    """A mixed-size dataset in alternating order must (a) produce the
    same metrics/rows as a scene_batch=1 sweep -- grouping only reorders
    the sweep -- and (b) actually share dispatches within each shape
    group (VERDICT r4 weak-item 5: flush-on-shape-change alone degrades
    alternating shapes to scene_batch=1)."""
    from lft_tpu.inference.tiled import evaluate_dataset

    class MixedSet:
        """Scenes alternate between two geometries."""

        def __init__(self):
            rng = np.random.RandomState(7)
            self.scenes = []
            for i in range(6):
                h0, w0 = (12, 12) if i % 2 == 0 else (16, 12)
                lr = rng.rand(5 * h0, 5 * w0).astype(np.float32)
                hr = rng.rand(5 * h0 * 2, 5 * w0 * 2).astype(np.float32)
                self.scenes.append((lr, hr))

        def __len__(self):
            return len(self.scenes)

        def scene_name(self, i):
            return f"scene{i}"

        def scene_shape(self, i):
            return self.scenes[i][0].shape

        def __getitem__(self, i):
            return self.scenes[i]

    args = Args(angRes=5, scale_factor=2, channels=8, eval_batch=4,
                patch_size_for_test=8, stride_for_test=4)
    model = get_model(args)
    params = model.init(jax.random.PRNGKey(0), args)
    ds = MixedSet()

    calls = []

    class CountingCache(ScenePipelineCache):
        def run_batch(self, params, lrs):
            calls.append(len(lrs))
            return super().run_batch(params, lrs)

    base = evaluate_dataset(model.apply, params, args, ds,
                            cache=ScenePipelineCache(model.apply, args,
                                                     scene_batch=1))
    grouped = evaluate_dataset(model.apply, params, args, ds,
                               cache=CountingCache(model.apply, args,
                                                   scene_batch=3))
    assert base[2] == grouped[2]          # per-scene rows, dataset order
    assert (base[0], base[1]) == (grouped[0], grouped[1])
    # 3 scenes of each shape, scene_batch=3 -> exactly one dispatch per
    # shape group; without grouping the alternating order would give 6
    assert calls == [3, 3], calls


def test_capabilities_survive_wrappers():
    """capabilities_of must resolve wrapped applies (functools.partial /
    functools.wraps chains) to the owning ModelDef's declared set
    (VERDICT r4 weak-item 6)."""
    import functools
    from lft_tpu.registry import MODEL_REGISTRY, capabilities_of
    lft = MODEL_REGISTRY["LFT"]
    assert capabilities_of(lft.apply) == lft.capabilities

    wrapped = functools.partial(lft.apply)
    assert capabilities_of(wrapped) == lft.capabilities
    double = functools.partial(wrapped)
    assert capabilities_of(double) == lft.capabilities

    @functools.wraps(lft.apply)
    def adapter(*a, **kw):
        return lft.apply(*a, **kw)

    assert capabilities_of(adapter) == lft.capabilities

    def stranger(*a, **kw):
        return None

    assert capabilities_of(stranger) == frozenset()
