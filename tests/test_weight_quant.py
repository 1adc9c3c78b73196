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
