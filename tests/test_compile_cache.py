"""Persistent compilation cache wiring (utils/compile_cache.py)."""

import os

import jax

from sjd_tpu.utils import compile_cache as cc


def test_enable_sets_config(tmp_path, monkeypatch):
    monkeypatch.setattr(cc, "_enabled", False)
    monkeypatch.delenv("SJD_TPU_CACHE_DIR", raising=False)
    d = cc.enable_persistent_cache(str(tmp_path / "cache"))
    assert d == str(tmp_path / "cache") and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent: second call returns the dir without re-config
    assert cc.enable_persistent_cache(str(tmp_path / "cache")) == d


def test_env_disable(monkeypatch):
    monkeypatch.setattr(cc, "_enabled", False)
    monkeypatch.setenv("SJD_TPU_CACHE_DIR", "0")
    assert cc.enable_persistent_cache() is None
    assert cc._enabled is False


def test_env_dir_override(tmp_path, monkeypatch):
    monkeypatch.setattr(cc, "_enabled", False)
    monkeypatch.setenv("SJD_TPU_CACHE_DIR", str(tmp_path / "envcache"))
    d = cc.enable_persistent_cache()
    assert d == str(tmp_path / "envcache") and os.path.isdir(d)


def test_compile_watch_meters_backend_compiles():
    """compile_watch must accumulate per-program PJRT compile seconds so
    bench rows report MEASURED compile time (the old wall-clock subtraction
    once 'measured' a warm compile as slower than cold)."""
    import jax
    import jax.numpy as jnp

    from sjd_tpu.utils import compile_watch

    before = compile_watch.snapshot()

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x).sum()

    jax.block_until_ready(f(jnp.ones((64, 64), jnp.float32)))
    d = compile_watch.delta(before)
    assert d["programs"] >= 1
    assert d["backend_compile_s"] > 0
    # delta is scoped: a fresh snapshot shows nothing new
    assert compile_watch.delta(compile_watch.snapshot())["programs"] == 0
