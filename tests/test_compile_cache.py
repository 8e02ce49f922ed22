"""Persistent-compilation-cache wiring (utils/compile_cache.py).

CLI-only feature: args_to_config / speed.py / predict.py call
``enable_persistent_cache()`` so multi-minute XLA compiles survive process
restarts; DYT_COMPILE_CACHE=0 opts out.  Tests restore the global config.
"""

import os

import jax
import pytest

import dynamic_tuning_tpu.utils.compile_cache as cc


@pytest.fixture(autouse=True)
def _restore_jax_cache_config():
    # jax initializes its cache backend lazily ONCE per process; an earlier
    # test that jitted with a cache dir configured (the CLI tests call
    # args_to_config -> enable_persistent_cache) pins the old dir, and a
    # later config update alone doesn't re-point it — reset around each
    # test so the dir configured HERE is the one that takes effect
    from jax._src import compilation_cache as jax_cc

    before = jax.config.jax_compilation_cache_dir
    done = cc._done
    jax_cc.reset_cache()
    yield
    jax.config.update("jax_compilation_cache_dir", before)
    cc._done = done
    jax_cc.reset_cache()


def test_env_zero_disables(monkeypatch):
    monkeypatch.setenv("DYT_COMPILE_CACHE", "0")
    cc._done = False
    assert cc.enable_persistent_cache() is None
    assert cc._done is False


def test_env_dir_enables_and_writes(tmp_path, monkeypatch):
    cache = str(tmp_path / "xla")
    monkeypatch.setenv("DYT_COMPILE_CACHE", cache)
    cc._done = False
    assert cc.enable_persistent_cache() == cache
    assert os.path.isdir(cache)
    assert jax.config.jax_compilation_cache_dir == cache
    # idempotent second call keeps the same dir without re-configuring
    assert cc.enable_persistent_cache() == cache

    # functional: a compiled program actually lands on disk (drop the
    # min-compile-time floor so the tiny test kernel qualifies)
    min_t = jax.config.jax_persistent_cache_min_compile_time_secs
    min_b = jax.config.jax_persistent_cache_min_entry_size_bytes
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        import jax.numpy as jnp

        @jax.jit
        def f(x):
            return (x @ x).sum()

        f(jnp.ones((64, 64))).block_until_ready()
        assert os.listdir(cache), "no cache entry written"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_t)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", min_b)


def test_default_dir_under_home(monkeypatch, tmp_path):
    monkeypatch.delenv("DYT_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))
    cc._done = False
    p = cc.enable_persistent_cache()
    assert p == str(tmp_path / ".cache" / "dynamic_tuning_tpu" / "xla")
    assert os.path.isdir(p)
