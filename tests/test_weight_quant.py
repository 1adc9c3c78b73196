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
