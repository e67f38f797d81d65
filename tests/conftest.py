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
# NOTE: jaxlib 0.9.0's XLA:CPU backend segfaults/aborts deep into ANY
# long single pytest process (~200th compiled program, ~test 115-130 of
# a full run) — inside backend_compile_and_load without the cache, or
# inside deserialize_executable with it. ALWAYS run the suite in
# bounded module groups (scripts/ci.sh runs four, each its own
# process); a cache dir then makes warm reruns fast. Never share one
# cache dir between concurrent processes: two writers corrupt entries
# and later readers crash.
_cache = os.environ.get("VOXBLOX_TEST_JAX_CACHE")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
