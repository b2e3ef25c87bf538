"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths compile and execute without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: never run tests on the TPU chip
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The host environment exports JAX_PLATFORMS=axon (the TPU tunnel) and jax
# may already have been imported by a pytest plugin before this conftest
# runs, freezing that env value into jax.config. Override the live config
# too — tests must run on the virtual CPU mesh, not the real chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's wall time is dominated by
# CPU compiles of the big fused programs (measured 80s -> 27s for the
# 512² follow_flows program on a warm cache). Safe here because the cache
# is written and read on the same host.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/classpose_tpu/jax-cpu-tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
