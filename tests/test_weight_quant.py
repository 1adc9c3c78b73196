"""W8A8 int8 serving mode: quantized matmuls must closely track bf16/fp32."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sjd_tpu.core import EngineConfig, GrammarSpec, SJDEngine, SamplingParams
from sjd_tpu.models import DecoderConfig, decoder_model_fns, init_params
from sjd_tpu.models.transformer import linear, quantize_weights

from helpers import TINY, tiny_params


def test_linear_w8a8_close_to_fp():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 7, 64).astype(np.float32))
    w = jnp.asarray(rs.randn(96, 64).astype(np.float32) * 0.05)
    want = np.asarray(linear(x, w))
    wq = quantize_weights({"layers": {"wq": w}, "lm_head": w})["layers"]["wq"]
    got = np.asarray(linear(x, wq))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02, rel


def test_quantized_forward_logits_close():
    params = tiny_params()
    qparams = quantize_weights(params)
    from sjd_tpu.models import forward_train, make_rope_table

    rope = make_rope_table(TINY, 64)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)
    pos = jnp.arange(6, dtype=jnp.int32)[None]
    lf = forward_train(params, TINY, ids, pos, rope_table=rope, remat=False)
    lq = forward_train(qparams, TINY, ids, pos, rope_table=rope, remat=False)
    # logits track within quantization noise; top-1 agreement high
    agree = (np.argmax(np.asarray(lf), -1) == np.argmax(np.asarray(lq), -1)).mean()
    assert agree >= 0.8, agree
    rel = np.abs(np.asarray(lf - lq)).max() / np.abs(np.asarray(lf)).max()
    assert rel < 0.25, rel


def test_quantized_engine_generates():
    """The full SJD engine runs on a W8A8 pytree (same code path — `linear`
    dispatches on the leaf type)."""
    params = quantize_weights(tiny_params())
    from helpers import make_engine

    eng = make_engine(window=5, max_len=32)
    res = eng.generate(params, jax.random.PRNGKey(0),
                       jnp.asarray([[1, 2, 3]], jnp.int32))
    toks = np.asarray(res.tokens)
    assert int(res.gen_count[0]) >= 29
    assert toks.max() < TINY.vocab_size and toks.min() >= 0


def test_linear_w4_close():
    """Packed per-channel int4 dot tracks the fp matmul."""
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(4, 7, 64).astype(np.float32))
    w = jnp.asarray(rs.randn(96, 64).astype(np.float32) * 0.05)
    want = np.asarray(linear(x, w))
    wq = quantize_weights(
        {"layers": {"wq": w}, "lm_head": w}, bits=4, equilibrate=False
    )["layers"]["wq"]
    assert "q4p" in wq and wq["q4p"].shape == (96, 32)
    assert wq["q4p"].dtype == jnp.uint8 and wq["s"].shape == (96,)
    got = np.asarray(linear(x, wq))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.2, rel


def test_int4_matches_explicit_dequant():
    """The packed int4 dot computes exactly dequantize-then-matmul."""
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(3, 32).astype(np.float32))
    w = jnp.asarray(rs.randn(48, 32).astype(np.float32))
    wq = quantize_weights(
        {"layers": {"wq": w}, "lm_head": w}, quantize_head=False,
        bits=4, equilibrate=False,
    )["layers"]["wq"]
    from sjd_tpu.models.transformer import unpack_int4

    q = np.asarray(unpack_int4(wq["q4p"]), np.float32)
    s = np.asarray(wq["s"], np.float32)
    w_deq = q * s[:, None]
    want = np.asarray(x) @ w_deq.T
    got = np.asarray(linear(x, wq))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_int4_fallback_when_odd_k():
    """Odd K (unpackable) falls back to int8 per-channel."""
    w = jnp.asarray(np.random.RandomState(3).randn(8, 13).astype(np.float32))
    wq = quantize_weights({"layers": {"wq": w}}, quantize_head=False,
                          bits=4, equilibrate=False)["layers"]["wq"]
    assert "q" in wq and "q4p" not in wq


def test_equilibration_is_exact():
    """equilibrate_for_int4 folds are lossless: fp logits are unchanged."""
    from sjd_tpu.models import forward_train, make_rope_table
    from sjd_tpu.models.transformer import equilibrate_for_int4

    params = tiny_params()
    eq = equilibrate_for_int4(params, TINY)
    rope = make_rope_table(TINY, 64)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)
    pos = jnp.arange(6, dtype=jnp.int32)[None]
    lf = forward_train(params, TINY, ids, pos, rope_table=rope, remat=False)
    le = forward_train(eq, TINY, ids, pos, rope_table=rope, remat=False)
    np.testing.assert_allclose(np.asarray(le), np.asarray(lf),
                               rtol=2e-3, atol=2e-3)


def test_equilibration_reduces_int4_error():
    """On a pytree with outlier input columns, equilibrated int4 logits are
    closer to fp than raw int4 logits."""
    from sjd_tpu.models import forward_train, make_rope_table

    params = tiny_params()
    # inject column outliers into every projection input
    lay = dict(params["layers"])
    rs = np.random.RandomState(7)
    boost = jnp.asarray(1.0 + 9.0 * (rs.rand(TINY.hidden_size) < 0.1))
    for k in ("wq", "wk", "wv", "w_gate", "w_up"):
        lay[k] = lay[k] * boost[None, None, :]
    params = dict(params, layers=lay)

    rope = make_rope_table(TINY, 64)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)
    pos = jnp.arange(6, dtype=jnp.int32)[None]
    lf = np.asarray(forward_train(params, TINY, ids, pos, rope_table=rope,
                                  remat=False))

    def err(q):
        lq = np.asarray(forward_train(q, TINY, ids, pos, rope_table=rope,
                                      remat=False))
        return np.abs(lq - lf).mean()

    e_raw = err(quantize_weights(params, bits=4, equilibrate=False))
    e_eq = err(quantize_weights(params, bits=4, config=TINY))
    assert e_eq < e_raw, (e_eq, e_raw)


def test_int4_engine_generates():
    """The full SJD engine runs on a packed-int4 pytree end-to-end."""
    params = quantize_weights(tiny_params(), bits=4, config=TINY)
    from helpers import make_engine

    eng = make_engine(window=5, max_len=32)
    res = eng.generate(params, jax.random.PRNGKey(0),
                       jnp.asarray([[1, 2, 3]], jnp.int32))
    toks = np.asarray(res.tokens)
    assert int(res.gen_count[0]) >= 29
    assert toks.max() < TINY.vocab_size and toks.min() >= 0


def test_int8_embedding_table():
    """embed_bits=8 (VERDICT r3 #4): per-ROW int8 embedding quantization —
    the gather dequantizes exactly (row error bounded by the row's own
    scale/127) and the engine generates end-to-end on a pytree with a
    quantized embed + packed-int4 projections (the big-vocab serving
    configuration that frees the Emu3 3rd slot)."""
    from sjd_tpu.models.transformer import embed_lookup

    params = tiny_params()
    q = quantize_weights(params, bits=4, config=TINY, embed_bits=8)
    assert isinstance(q["embed"], dict) and q["embed"]["q"].dtype == jnp.int8
    ids = jnp.asarray([[0, 1, 5], [63, 7, 2]], jnp.int32)
    a = np.asarray(embed_lookup(params, ids, jnp.float32))
    b = np.asarray(embed_lookup(q, ids, jnp.float32))
    # per-row bound: rounding s_row/2 = max|row|/254, plus the scale itself
    # being stored bf16 (rel err <= 2^-9 on up-to-127 quanta)
    rows = np.asarray(params["embed"])[np.asarray(ids)]
    bound = np.abs(rows).max(-1, keepdims=True) * (
        1 / 254.0 + 127.0 / 127.0 * 2.0**-9
    ) + 1e-7
    assert (np.abs(a - b) <= bound).all()

    from helpers import make_engine

    eng = make_engine(window=5, max_len=32)
    res = eng.generate(q, jax.random.PRNGKey(0),
                       jnp.asarray([[1, 2, 3]], jnp.int32))
    assert int(res.gen_count[0]) >= 29


def test_embed_bits_rejects_tied_embeddings():
    import pytest

    cfg = dataclasses.replace(TINY, tie_word_embeddings=True)
    p = init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(AssertionError):
        quantize_weights(p, bits=8, embed_bits=8)


def test_persist_int4_params_bit_matches_packed():
    """s4-at-rest (round 4): persist_int4_params unpacks packed leaves ONCE
    (freeing the duplicate weight copy on TPU serving — PERF_NOTES) and the
    engine must generate BIT-IDENTICAL tokens from the persisted pytree:
    the in-jit unpack computed exactly the same s4 values every call."""
    from sjd_tpu.models.transformer import persist_int4_params

    from helpers import make_engine

    packed = quantize_weights(tiny_params(), bits=4, config=TINY)
    eng = make_engine(window=5, max_len=32)
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    # run the packed path FIRST: persist DONATES (consumes) its input tree
    a = eng.generate(packed, jax.random.PRNGKey(0), prompt)

    persisted = persist_int4_params(packed)
    q = persisted["layers"]["wq"]
    assert "q4p" not in q and q["q"].dtype == jnp.int4
    # idempotent: already-persisted trees pass through untouched
    again = persist_int4_params(persisted)
    assert again["layers"]["wq"]["q"] is q["q"]

    b = eng.generate(persisted, jax.random.PRNGKey(0), prompt)
    assert (np.asarray(a.tokens) == np.asarray(b.tokens)).all()
    assert int(a.nfe) == int(b.nfe)


def test_persist_int4_emits_no_donation_warnings():
    """Round-5 verdict #6: the headline bench must not print allocator
    warnings. persist_int4_params' unpack changes dtype+layout, so the
    donated packed buffers can never be aliased — that warning is expected,
    justified in the docstring, and must be silenced AT the call."""
    import warnings

    from sjd_tpu.models.transformer import persist_int4_params

    packed = quantize_weights(tiny_params(), bits=4, config=TINY)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)  # any escape -> failure
        persisted = persist_int4_params(packed)
    assert persisted["layers"]["wq"]["q"].dtype == jnp.int4


def test_subbyte_layout_strippable_condition():
    """The axon s4 jit-input workaround (utils/subbyte_io.py) strips the
    layout constraint ONLY for the diagnosed bug signature: identical
    major_to_minor + tiling, sub-byte metadata 0 on one side."""
    from jax._src.layout import Layout

    from sjd_tpu.utils.subbyte_io import _strippable

    bug_x = Layout((0, 1, 2), ((64, 128), (8, 1)), 0)
    expect = Layout((0, 1, 2), ((64, 128), (8, 1)), 4)
    assert _strippable(bug_x, expect)
    assert _strippable(expect, bug_x)
    # equal layouts: nothing to strip
    assert not _strippable(expect, expect)
    # a REAL relayout (different tiling / order) must NOT be stripped
    assert not _strippable(Layout((0, 1, 2), ((8, 128), (8, 1)), 0), expect)
    assert not _strippable(Layout((2, 1, 0), ((64, 128), (8, 1)), 0), expect)
    # both sides claiming real sub-byte sizes is not the bug signature
    assert not _strippable(Layout((0, 1, 2), ((64, 128), (8, 1)), 2), expect)
