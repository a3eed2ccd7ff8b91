"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (tiles x samples mesh axes) is validated the standard
TPU-SPMD way — `--xla_force_host_platform_device_count=8` on the CPU
backend — because real multi-chip hardware is not available in CI
(SURVEY.md §4(d)).

Note: this environment's sitecustomize force-registers the axon TPU
backend via ``jax.config.update("jax_platforms", ...)`` which overrides the
``JAX_PLATFORMS`` env var, so we must override the config again here.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeat test runs skip XLA recompiles (keyed
# by HLO hash, so code changes invalidate exactly what they touch). One
# cache dir PER xdist worker: concurrently shared AOT entries have been
# observed to crash workers on load (machine-feature mismatch).
_worker = os.environ.get("PYTEST_XDIST_WORKER", "gw0")
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_test_cache_{_worker}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np
import pytest

from pathtrace_tpu import Camera, RenderConfig, cornell_box


@pytest.fixture(scope="session")
def scene():
    return cornell_box()


@pytest.fixture(scope="session")
def camera():
    return Camera.create()


@pytest.fixture(scope="session")
def tiny_cfg():
    """BASELINE config #1: 64x64, 1 spp, 2 bounces, jnp backend."""
    return RenderConfig(width=64, height=64, spp=1, max_bounces=2, backend="jnp")


@pytest.fixture(scope="session")
def small_cfg():
    return RenderConfig(width=64, height=64, spp=4, backend="jnp")
