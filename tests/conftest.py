"""Test config: force a CPU backend with 8 virtual devices.

The container's sitecustomize registers the (exclusive, single) TPU chip
into every interpreter; tests must not fight the benchmark for it, and the
sharding tests need 8 devices. JAX caches the JAX_PLATFORMS env var at
import, so the override goes through jax.config.update before any backend
initializes. Set DF_TESTS_ON_TPU=1 to run the suite on the real chip.

Kernels run in Pallas interpreter mode on CPU (auto-detected by
deepfusion_tpu.utils.env.interpret_kernels). Oracle strategy mirrors the
reference (SURVEY.md §4): numpy oracles in deepfusion_tpu.ops.ref play
MKL-DNN's role.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("DF_TESTS_ON_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running case")
