"""int8 KV cache: quantized decode must closely track the bf16/fp32 cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sjd_tpu.core import EngineConfig, GrammarSpec, SJDEngine, SamplingParams
from sjd_tpu.models import DecoderConfig, decoder_model_fns, init_params
from sjd_tpu.models.transformer import _quantize_rows

import dataclasses


def test_quantize_rows_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4, 16)) * 3.0
    q, s = _quantize_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 5, 4)
    deq = q.astype(jnp.float32) * np.asarray(s, np.float32)[..., None]
    err = np.abs(np.asarray(x) - deq).max() / np.abs(np.asarray(x)).max()
    assert err < 0.01, err  # 1/254 relative quantization step


def test_int8_kv_greedy_decode_matches_fp32():
    """On a tiny model, greedy decoding with int8 KV matches the fp32-cache
    trajectory (logit gaps far exceed the quantization noise)."""
    base = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, qk_norm=True,
        dtype=jnp.float32, max_position_embeddings=128,
    )
    quant = dataclasses.replace(base, kv_quant=True)
    params = init_params(jax.random.PRNGKey(0), base)
    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)

    outs = {}
    for name, cfg in (("fp32", base), ("int8", quant)):
        eng = SJDEngine(
            decoder_model_fns(cfg, max_positions=128),
            EngineConfig(window=4, scheme="jacobi", max_len=40),
            GrammarSpec(kind="none", image_vocab_start=0, image_vocab_end=63),
            SamplingParams(do_cfg=False, greedy=True, image_top_k=64, text_top_k=64),
        )
        res = eng.generate(params, jax.random.PRNGKey(0), prompt)
        outs[name] = np.asarray(res.tokens[0, : int(res.length[0])])
    # identical trajectories on this toy model
    agree = (outs["fp32"][:30] == outs["int8"][:30]).mean()
    assert agree > 0.9, (agree, outs)
