"""PersistedJit: serialized-executable warm starts (utils/aot_cache.py).

The CPU test backend is excluded from persistence by policy (no lowering
tax to save; XLA:CPU AOT blobs are machine-feature-pinned and can SIGILL on
a different host), so these tests pin the *fallback* contract — results
identical to plain jit, no crash, no cache files — plus the key/memo logic
that the TPU path relies on. The capable path is driven on the real chip
(PERF_NOTES "Serving warm-start (round 5)")."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from sjd_tpu.utils import aot_cache
from sjd_tpu.utils.aot_cache import PersistedJit, _args_key, persisted_jit


def test_fallback_matches_jit(tmp_path, monkeypatch):
    monkeypatch.setenv("SJD_TPU_AOT_CACHE", str(tmp_path / "aot"))

    def f(x, s):
        return x * 2, {"a": s["a"] + 1}

    pj = persisted_jit(f, donate_argnums=(1,), tag="t")
    x = jnp.arange(8.0)
    y, s1 = pj(x, {"a": jnp.ones((4,))})
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x * 2))
    np.testing.assert_array_equal(np.asarray(s1["a"]), 2 * np.ones((4,)))
    # second call takes the memo path
    y2, _ = pj(jnp.arange(8.0), {"a": jnp.ones((4,))})
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y))


def test_incapable_backend_writes_nothing(tmp_path, monkeypatch):
    d = tmp_path / "aot"
    monkeypatch.setenv("SJD_TPU_AOT_CACHE", str(d))
    monkeypatch.setattr(aot_cache, "_CAPABLE", False)
    pj = persisted_jit(lambda x: x + 1, tag="t")
    pj(jnp.zeros((2,)))
    assert not d.exists() or not any(
        p.name.endswith(".aotx") for p in d.iterdir()
    )


def test_args_key_discriminates():
    a = (jnp.zeros((2, 3), jnp.float32),)
    assert _args_key(a) != _args_key((jnp.zeros((3, 2), jnp.float32),))
    assert _args_key(a) != _args_key((jnp.zeros((2, 3), jnp.bfloat16),))
    # python scalars key by type, not value (they are traced weak operands)
    assert _args_key((3,)) == _args_key((4,))
    assert _args_key((3,)) != _args_key((3.0,))
    # tree structure (incl. None subtrees) is part of the key
    assert _args_key((None, a[0])) != _args_key((a[0], None))
    # identical calls agree (memo hit)
    assert _args_key(a) == _args_key((jnp.zeros((2, 3), jnp.float32),))


def test_persistence_roundtrip_with_forced_capability(tmp_path, monkeypatch):
    """Force-capable on CPU to exercise the write path and the corrupt-entry
    recovery; whether CPU deserialization succeeds or fails, results must
    match plain jit and a corrupt entry must fall through to a fresh
    compile, not crash."""
    d = tmp_path / "aot"
    monkeypatch.setenv("SJD_TPU_AOT_CACHE", str(d))
    monkeypatch.setattr(aot_cache, "_CAPABLE", True)

    pj = persisted_jit(lambda x: x * 3, tag="t")
    x = jnp.arange(4.0)
    np.testing.assert_array_equal(np.asarray(pj(x)), np.asarray(x * 3))
    files = [p for p in d.iterdir() if p.name.endswith(".aotx")]
    assert len(files) == 1, "executable blob must be persisted"

    # a fresh wrapper hits the disk entry; on CPU deserialize fails ->
    # silent recompile with identical results
    pj2 = persisted_jit(lambda x: x * 3, tag="t")
    np.testing.assert_array_equal(np.asarray(pj2(x)), np.asarray(x * 3))

    # corrupt entry: same contract
    files[0].write_bytes(b"garbage")
    pj3 = persisted_jit(lambda x: x * 3, tag="t")
    np.testing.assert_array_equal(np.asarray(pj3(x)), np.asarray(x * 3))


def test_key_fn_and_source_hash_in_path(tmp_path, monkeypatch):
    monkeypatch.setenv("SJD_TPU_AOT_CACHE", str(tmp_path / "aot"))
    pj1 = PersistedJit(lambda x: x, key_fn=lambda: "cfgA", tag="t")
    pj2 = PersistedJit(lambda x: x, key_fn=lambda: "cfgB", tag="t")
    a = (jnp.zeros((2,)),)
    assert pj1._entry_path(a) != pj2._entry_path(a)
    assert pj1._entry_path(a) == PersistedJit(
        lambda x: x, key_fn=lambda: "cfgA", tag="t"
    )._entry_path(a)
    assert aot_cache._source_hash() == aot_cache._source_hash()


def test_disabled_by_env(monkeypatch):
    monkeypatch.setenv("SJD_TPU_AOT_CACHE", "0")
    assert aot_cache.cache_dir() is None
    pj = persisted_jit(lambda x: x + 1, tag="t")
    assert pj._entry_path((jnp.zeros((2,)),)) is None
    np.testing.assert_array_equal(
        np.asarray(pj(jnp.zeros((2,)))), np.ones((2,))
    )


def test_engine_jits_are_persisted():
    """The engine's three dispatch points ride PersistedJit (the warm-start
    feature is on by default wherever the backend supports it)."""
    from sjd_tpu.core import (
        EngineConfig, GrammarSpec, SJDEngine, SamplingParams,
    )
    from sjd_tpu.models import DecoderConfig, decoder_model_fns, init_params

    cfg = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=1,
        num_heads=2, num_kv_heads=2, head_dim=16,
        max_position_embeddings=128,
    )
    eng = SJDEngine(
        decoder_model_fns(cfg, max_positions=128),
        EngineConfig(window=4, max_len=24, cfg_mode="none"),
        GrammarSpec(kind="none", image_vocab_start=0, image_vocab_end=63),
        SamplingParams(do_cfg=False, image_top_k=64, text_top_k=64),
    )
    assert isinstance(eng._generate, PersistedJit)
    assert isinstance(eng._continue, PersistedJit)
    assert isinstance(eng._refill, PersistedJit)
    params = init_params(jax.random.PRNGKey(0), cfg)
    res = eng.generate(
        params, jax.random.PRNGKey(0), jnp.asarray([[1, 2, 3]], jnp.int32)
    )
    assert int(res.gen_count[0]) > 0
