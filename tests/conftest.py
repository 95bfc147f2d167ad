"""Test configuration.

The container's sitecustomize pre-imports jax and registers the `axon` TPU
tunnel backend in every Python process.  For tests we want a fast, hermetic,
8-virtual-device CPU platform (the standard JAX way to exercise Mesh/
shard_map code without hardware), so we re-point jax at CPU *after* import —
backends initialise lazily, so this works as long as no array op ran yet.
"""

import os

import jax

# Must happen before the CPU backend is first used.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite jit-compiles large while_loop/scan
# programs; caching them makes re-runs seconds instead of minutes.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
