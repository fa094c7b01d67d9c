"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must run before jax initializes a backend: the environment in this container
pins JAX_PLATFORMS=axon (a tunneled single TPU chip); tests force the CPU
platform with 8 virtual host devices so multi-chip sharding paths are
exercised without hardware.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: most of the suite's wall time is XLA:CPU
# compiles of the device-tier programs, re-done every run (and re-done
# within a run by the periodic clear_caches below). The disk cache keys by
# HLO hash, so code changes invalidate exactly the programs they alter;
# everything else loads in milliseconds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


_MODULES_SINCE_CLEAR = [0]


@pytest.fixture(autouse=True, scope="module")
def _jax_cache_reset_between_modules():
    """Free compiler state periodically at module boundaries.

    A full-suite run accumulates hundreds of compiled XLA:CPU programs in
    one process; past a threshold the CPU backend's compiler has been
    observed to segfault while compiling yet another program (reproducible
    only in long runs — every module passes in isolation; ~24 modules of
    accumulation crashed). Clearing jax's caches every third module bounds
    the accumulation far below that threshold while limiting the recompile
    overhead for shared kernels."""
    yield
    _MODULES_SINCE_CLEAR[0] += 1
    if _MODULES_SINCE_CLEAR[0] >= 3:
        _MODULES_SINCE_CLEAR[0] = 0
        jax.clear_caches()
