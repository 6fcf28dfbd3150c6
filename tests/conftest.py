"""Test harness config: force an 8-device virtual CPU mesh.

All unit tests run on CPU (fast compile, deterministic) with 8 virtual
devices so multi-chip sharding paths (pjit/shard_map over a Mesh) are
exercised without TPU hardware. Benchmarks (bench.py) run on the real
chip and do NOT import this file.

Note: the environment's sitecustomize registers a TPU plugin and calls
jax.config.update("jax_platforms", ...) at interpreter start, so setting
JAX_PLATFORMS alone is not enough — we must update the config again
before any backend is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the big fused step functions (odometry
# megastep, window BA, init round) take minutes to compile on a small
# CPU host; cache them across pytest runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
