"""Test harness: hermetic CPU backend with 8 virtual devices.

Tests never require TPU hardware: the sharding tests simulate an 8-chip mesh
on CPU (SURVEY.md §4: `XLA_FLAGS=--xla_force_host_platform_device_count`),
and everything else is resolution-independent math that behaves identically
across backends.

Note: the TPU image's sitecustomize imports jax at interpreter startup, so
env vars set here are too late for platform selection — use jax.config (it
takes effect as long as no backend has been *initialized* yet).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: XLA-CPU compiles of the wavefront depth loop
# take 20-30 s each and dominate suite wall time on a 1-core runner; cached
# reruns cut the suite from ~17 min to a few minutes.  This is the CPU
# backend — the axon-relay pathology that keeps the cache off on TPU
# (utils/cache.py) does not apply here.
from spt_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(os.path.dirname(__file__), ".jax_cache"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
