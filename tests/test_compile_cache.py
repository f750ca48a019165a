"""Persistent-compilation-cache helper (utils/compile_cache.py).

The reference has no compile-caching concern (torch eager); on TPU the
flagship program costs minutes of XLA compile per process, so the CLIs
enable JAX's persistent cache. These tests cover the helper's contract:
env opt-out, idempotency, config effect, and actual on-disk reuse.
"""

import importlib

import pytest


@pytest.fixture()
def fresh_module(monkeypatch):
    from densefusion_tpu.utils import compile_cache

    importlib.reload(compile_cache)
    yield compile_cache
    importlib.reload(compile_cache)  # clear the enabled state for others


def test_env_optout(fresh_module, monkeypatch, tmp_path):
    monkeypatch.setenv("DF_JAX_CACHE", "0")
    assert fresh_module.enable_persistent_compilation_cache(
        str(tmp_path)) is None


def test_enable_sets_config_and_is_idempotent(fresh_module, monkeypatch,
                                              tmp_path):
    import jax

    monkeypatch.delenv("DF_JAX_CACHE", raising=False)
    d = str(tmp_path / "cache")
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert fresh_module.enable_persistent_compilation_cache(d) == d
        assert jax.config.jax_compilation_cache_dir == d
        # second call (different path) is a no-op returning the first dir
        assert fresh_module.enable_persistent_compilation_cache(
            str(tmp_path / "other")) == d
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_cache_writes_and_reuses(fresh_module, monkeypatch, tmp_path):
    import jax
    import jax.numpy as jnp

    monkeypatch.delenv("DF_JAX_CACHE", raising=False)
    d = str(tmp_path / "cache")
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        assert fresh_module.enable_persistent_compilation_cache(d) == d
        # everything qualifies for the test, not just >2s compiles
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x).sum()

        f(jnp.ones((16, 16), jnp.float32)).block_until_ready()
        entries = list((tmp_path / "cache").iterdir())
        assert entries, "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
