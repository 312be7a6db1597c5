"""Test config: force the CPU backend with 8 virtual devices so sharding /
multi-chip tests run anywhere (SURVEY.md §4), independent of real TPUs."""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against torch CPU float32: keep matmuls exact-f32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "goldens")


@pytest.fixture(scope="session")
def goldens():
    def load(name):
        path = os.path.join(GOLDEN_DIR, name)
        if not os.path.exists(path):
            pytest.skip(f"golden fixture {name} not generated "
                        f"(run tools/gen_goldens.py)")
        return np.load(path)
    return load
