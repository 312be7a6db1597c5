"""CLI tool tests: generate_data (synth mode), checkpoint converter,
dead-code parity helpers."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_generate_data_synth_cli(tmp_path):
    import generate_data
    generate_data.main(["--mode", "synth", "--dst", str(tmp_path),
                        "--angRes", "5", "--scale_factor", "2",
                        "--n_train", "2", "--n_test", "1"])
    train_files = list((tmp_path / "data_for_train").rglob("*.h5"))
    test_files = list((tmp_path / "data_for_test").rglob("*.h5"))
    assert len(train_files) == 2 and len(test_files) == 1


def test_convert_ckpt_cli(tmp_path):
    import pytest
    pytest.importorskip("torch")
    from lft_tpu.config import Args
    from lft_tpu.models import lft
    from lft_tpu.utils.checkpoint import save_checkpoint, pth_to_params
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import convert_ckpt

    args = Args(channels=16, scale_factor=2)
    p = {k: np.asarray(v) for k, v in
         lft.init_params(jax.random.PRNGKey(0), args).items()}
    npz = str(tmp_path / "a.npz")
    pth = str(tmp_path / "a.pth")
    save_checkpoint(npz, p, epoch=9)
    convert_ckpt.main([npz, pth])
    params, epoch = pth_to_params(pth)
    assert epoch == 9
    np.testing.assert_array_equal(params["conv_init0.0.weight"],
                                  p["conv_init0.0.weight"])
    # and back
    npz2 = str(tmp_path / "b.npz")
    convert_ckpt.main([pth, npz2])
    from lft_tpu.utils.checkpoint import load_checkpoint
    p2, e2, _ = load_checkpoint(npz2)
    assert e2 == 9 and set(p2) == set(p)


def test_option_module_compat(tmp_path):
    """`option.py` is deliberate API compat with the reference's import-time
    argparse global (reference option.py:27, imported by utils/utils.py:7).
    It must expose a parsed `args` with the reference schema, including the
    `type=bool` quirk where any non-empty --use_pre_pth string is truthy."""
    script = (
        "import option\n"
        "a = option.args\n"
        "assert a.angRes == 5 and a.scale_factor == 4\n"
        "assert a.model_name == 'LFT' and a.channels == 64\n"
        "assert a.use_pre_pth is True  # 'False' is truthy (option.py:8)\n"
        "assert a.batch_size == 3\n"
        "print('option-compat OK')\n")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-c", script,
         "--scale_factor", "4", "--use_pre_pth", "False",
         "--batch_size", "3", "--unknown_flag", "ignored"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.join(os.path.dirname(__file__), ".."), env=env)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "option-compat OK" in res.stdout


@pytest.mark.slow  # ~70 s even at the tiny config (torch import + two
#                    f32-highest jit compiles)
def test_train_step_parity_vs_reference(tmp_path):
    """One-step (plus 2-step curve) training parity vs the reference's
    torch loop (tools/parity_train.py; reference train.py:77-84,111-138).
    The committed PARITY_train.json artifact records the fuller 8-step
    c16 run."""
    pytest.importorskip("torch")
    pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference mount not available")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import parity_train
    rc = parity_train.main(["--channels", "8", "--patch", "4", "--batch", "1",
                            "--steps", "2",
                            "--workdir", str(tmp_path),
                            "--json", str(tmp_path / "out.json")])
    assert rc == 0


def test_cal_loss_class_matches_reference_semantics():
    """Vectorized port must equal the reference's O(B*K^2) loop
    (reference utils/utils.py:197-210)."""
    from lft_tpu.ops.metrics import cal_loss_class
    rng = np.random.RandomState(0)
    prob = rng.rand(3, 5).astype(np.float32)
    loss_ref = 0.0
    B, K = prob.shape
    for b in range(B):
        sum_re = 0.0
        for i in range(K - 1):
            for j in range(i + 1, K):
                sum_re += abs(prob[b][i] - prob[b][j])
        loss_ref += (K - 1) - sum_re
    loss_ref /= B
    ours = float(cal_loss_class(jnp.asarray(prob)))
    assert abs(ours - loss_ref) < 1e-5


def test_compile_cache_dir_flag(tmp_path):
    """`--compile_cache_dir` must wire jax's persistent compilation cache:
    a first run populates the directory and a re-run (fresh process, same
    program) produces the identical result from the cached executables."""
    cache = str(tmp_path / "xla_cache")
    script = (
        "import sys\n"
        "sys.path.insert(0, %r)\n"
        "from lft_tpu.config import Args, apply_platform\n"
        "args = Args(platform='cpu', compile_cache_dir=%r,\n"
        "            channels=8, scale_factor=2, angRes=5)\n"
        "apply_platform(args)\n"
        "import jax, numpy as np\n"
        "from lft_tpu.registry import get_model\n"
        "model = get_model(args)\n"
        "params = model.init(jax.random.PRNGKey(0), args)\n"
        "x = np.random.RandomState(0).rand(1, 1, 40, 40).astype('float32')\n"
        "sr = jax.jit(lambda p, x: model.apply(p, x, args))(params, x)\n"
        "print(float(np.asarray(sr).sum()))\n"
    ) % (os.path.join(os.path.dirname(__file__), ".."), cache)
    outs = []
    for _ in range(2):
        p = subprocess.run([sys.executable, "-c", script],
                           capture_output=True, text=True, timeout=300)
        assert p.returncode == 0, p.stderr
        outs.append(p.stdout.strip().splitlines()[-1])
        assert os.listdir(cache), "cache directory must be populated"
    assert outs[0] == outs[1]
