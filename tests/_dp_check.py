"""Subprocess body for test_dp_training_matches_single_device: shard_map DP
over virtual CPU devices must reproduce single-device training numerics.
Run standalone: python tests/_dp_check.py"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from lft_tpu.config import Args  # noqa: E402
from lft_tpu.registry import get_model  # noqa: E402
from lft_tpu.parallel.mesh import (get_mesh, make_dp_train_step,  # noqa: E402
                                   put_global_batch)
from lft_tpu.training.trainer import make_train_step  # noqa: E402


def main():
    assert jax.device_count() >= 4
    # Tiny workload: XLA's CPU collective rendezvous hard-terminates 40 s
    # after the FIRST participant arrives, and on a 1-core host the four
    # shards compute serially -- per-shard time must stay well under
    # 40s/ndev even when the parent suite loads the machine.
    args = Args(angRes=3, scale_factor=2, channels=8, batch_size=4)
    model = get_model(args)
    # SGD isolates the sharding math: Adam's m/sqrt(v) amplifies float
    # reduction-order noise on near-zero grads into ~lr-sized param diffs.
    optimizer = optax.sgd(0.1)
    params0 = {k: np.asarray(v) for k, v in
               model.init(jax.random.PRNGKey(0), args).items()}

    def fresh():
        p = {k: jnp.asarray(v) for k, v in params0.items()}
        return p, optimizer.init(p)

    rng = np.random.RandomState(0)
    data = rng.rand(4, 1, 24, 24).astype(np.float32)
    label = rng.rand(4, 1, 48, 48).astype(np.float32)

    step1 = make_train_step(model, optimizer, args, with_metrics=False)
    p1, o1 = fresh()
    p1, o1, _ = step1(p1, o1, jnp.asarray(data), jnp.asarray(label))
    p1, o1, aux1b = step1(p1, o1, jnp.asarray(data), jnp.asarray(label))

    mesh = get_mesh(4)
    stepN = make_dp_train_step(model, optimizer, args, mesh, with_metrics=False)
    pN, oN = fresh()
    pN, oN, _ = stepN(pN, oN, *put_global_batch(mesh, data, label))
    pN, oN, auxNb = stepN(pN, oN, *put_global_batch(mesh, data, label))

    assert abs(float(aux1b["loss"]) - float(auxNb["loss"])) < 1e-6, (
        float(aux1b["loss"]), float(auxNb["loss"]))
    for k in p1:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(pN[k]),
                                   atol=1e-6, err_msg=k)
    print("DP == single-device: OK")





def cli_dp_fit():
    """Also exercise the train CLI's --num_devices wiring (put_batch +
    step_builder) with a tiny synthetic dataset."""
    import tempfile
    from lft_tpu.data.synth import make_synth_data
    import train as train_cli
    with tempfile.TemporaryDirectory() as d:
        paths = make_synth_data(d, ang_res=5, scale=2, n_train=4, n_test=1,
                                train_patch=16, test_hw=32)
        args = Args(angRes=5, scale_factor=2, channels=8, batch_size=4,
                    num_workers=0, epoch=1, num_devices=2,
                    path_for_train=paths["path_for_train"],
                    path_for_test=paths["path_for_test"],
                    data_name=paths["data_name"],
                    path_log=d + "/log/")
        params, history = train_cli.main(args)
        assert np.isfinite(history[0]["loss"]), history
    print("CLI --num_devices fit: OK")


if __name__ == "__main__":
    main()
    cli_dp_fit()
