"""Persistent compilation cache wiring (utils/exec_cache.py).

The functional payoff (a second PROCESS skipping remote compilation) is
exercised by the sustained-training runs; here we pin the wiring: the
package import enables the cache, the directory resolves with the right
priority, and disabling works.
"""

import os
from unittest import mock

import jax

import kantts_tpu  # noqa: F401  (package import calls enable())
from kantts_tpu.utils import exec_cache


def test_package_import_enabled_cache():
    assert jax.config.jax_compilation_cache_dir is not None
    assert jax.config.jax_compilation_cache_dir.endswith(".jax_compile_cache")


def test_enable_idempotent():
    before = jax.config.jax_compilation_cache_dir
    exec_cache.enable("/tmp/should-not-take-effect")
    assert jax.config.jax_compilation_cache_dir == before


def test_disable_env():
    with mock.patch.dict(os.environ, {"KANTTS_COMPILE_CACHE": "0"}):
        with mock.patch.object(exec_cache, "_DONE", False):
            before = jax.config.jax_compilation_cache_dir
            exec_cache.enable()
            # disabled: config untouched
            assert jax.config.jax_compilation_cache_dir == before


def test_env_dir_override():
    with mock.patch.dict(os.environ, {"KANTTS_COMPILE_CACHE": "/tmp/kc_t"}):
        with mock.patch.object(exec_cache, "_DONE", False):
            old = jax.config.jax_compilation_cache_dir
            try:
                exec_cache.enable()
                assert jax.config.jax_compilation_cache_dir == "/tmp/kc_t"
            finally:
                jax.config.update("jax_compilation_cache_dir", old)
                exec_cache._DONE = True
