"""Test config: run JAX on a virtual 8-device CPU mesh so distributed (DP)
semantics are testable without TPU hardware, and keep compilation fast.

Note: the environment may pre-import jax via sitecustomize with
JAX_PLATFORMS=axon; backends are initialized lazily, so overriding the config
here (before any device use) still lands us on CPU.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# XLA:CPU compile time dominates the suite (a 12x-unrolled decode scan costs
# minutes to compile on CPU while testing nothing the 1x program doesn't);
# the unroll knobs are TPU dispatch-amortization tuning, numerics-identical.
os.environ.setdefault("KANTTS_DECODE_UNROLL", "1")
os.environ.setdefault("KANTTS_DUR_UNROLL", "1")

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: repeat suite runs (the common case while
# iterating) skip recompiles entirely. Keyed by program, so test edits
# cannot stale-hit; delete the directory to force cold compiles.
_CACHE_DIR = os.environ.get(
    "KANTTS_TEST_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_test_cache"))
if _CACHE_DIR != "0":
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The full suite compiles hundreds of XLA:CPU programs in one process;
    keeping every LoadedExecutable alive for the whole run eventually
    segfaults the compiler mid-`backend_compile_and_load` (observed twice,
    nondeterministic test, only when fast+slow run together — each tier
    alone is green). Jitted functions are per-module closures, so dropping
    the caches between modules costs a few library-level recompiles and
    bounds the JIT arena instead.
    """
    yield
    import jax

    jax.clear_caches()
    gc.collect()
