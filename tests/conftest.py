"""Test harness: CPU backend.

Numerical tests run on a single CPU device (virtual multi-device meshes make
*eager* dispatch ~13x slower, and unit tests interleave lots of host/numpy
work). Multi-chip sharding tests (tests/test_parallel.py) spawn a
subprocess with ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` — the
same virtual-mesh recipe SURVEY.md §4 prescribes — so they get a true
8-device mesh without taxing every other test. Env must be set before jax
import.
"""

import os

# Force CPU: the ambient env carries JAX_PLATFORMS=axon (the TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: OPT-IN via VOXBLOX_TEST_JAX_CACHE=<dir>.
# Default OFF for CPU test runs: the CPU backend's AOT
# deserialize_executable path aborts the process partway through a long
# full-suite run (reproduced 3x at the same cache read, jax 0.9.0 —
# "Fatal Python error: Aborted" in compilation_cache.get_executable_and_
# time -> backend.deserialize_executable; the loader also warns that the
# compile-time machine features don't match the host). A cold suite
# recompiles everything (~15-20 min); with a cache dir set, reruns are
# fast but long single-process runs can die — use separate pytest
# groups (scripts/ci.sh) with it. Never share one cache dir between
# concurrent processes: two writers corrupt entries.
_cache = os.environ.get("VOXBLOX_TEST_JAX_CACHE")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
