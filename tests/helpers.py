"""Shared tiny-model fixtures for engine tests."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sjd_tpu.core import EngineConfig, GrammarSpec, SJDEngine, SamplingParams
from sjd_tpu.models import DecoderConfig, decoder_model_fns, init_params

TINY = DecoderConfig(
    vocab_size=64,
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    rope_theta=10000.0,
    qk_norm=True,
    dtype=jnp.float32,
    max_position_embeddings=512,
)

# a tiny "image grammar": image tokens 4..47, start 48, end 49, newline 50,
# size tokens base 52 (so size token 53 -> latent dim 2 with grid_scale=2)
TINY_GRAMMAR = GrammarSpec(
    kind="lumina",
    image_start_id=48,
    image_end_id=49,
    newline_id=50,
    image_vocab_start=4,
    image_vocab_end=47,
    size_token_base=52,
    grid_scale=2,
)


def tiny_params(seed: int = 0):
    return init_params(jax.random.PRNGKey(seed), TINY)


def make_engine(
    window=6,
    scheme="speculative_jacobi",
    init="random",
    max_len=64,
    cfg_mode="none",
    grammar=None,
    sampling=None,
    interval_r=10**9,
    eos_id=-1,
):
    model = decoder_model_fns(TINY, max_positions=512)
    econfig = EngineConfig(
        window=window,
        scheme=scheme,
        init=init,
        max_len=max_len,
        eos_id=eos_id,
        cfg_mode=cfg_mode,
        interval_r=interval_r,
    )
    sampling = sampling or SamplingParams(
        do_cfg=(cfg_mode != "none"), image_top_k=64, text_top_k=64
    )
    grammar = grammar or GrammarSpec(kind="none", image_vocab_start=0, image_vocab_end=63)
    return SJDEngine(model, econfig, grammar, sampling)


def ar_reference_decode(params, model_cfg, prompt, max_len, greedy=True):
    """Plain AR greedy decode via repeated full forwards (no cache) — the
    ground truth the greedy-Jacobi engine must bit-match. Fixed shapes so it
    compiles once."""
    from sjd_tpu.models import forward_train, make_rope_table

    rope = make_rope_table(model_cfg, max_len)

    @jax.jit
    def step(ids, t):
        pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
        logits = forward_train(params, model_cfg, ids, pos, rope_table=rope,
                               remat=False)
        nxt = jnp.argmax(logits[0, t - 1]).astype(jnp.int32)
        return ids.at[0, t].set(nxt)

    ids = jnp.zeros((1, max_len), jnp.int32)
    ids = ids.at[0, : len(prompt)].set(jnp.asarray(prompt, jnp.int32))
    for t in range(len(prompt), max_len):
        ids = step(ids, t)
    return [int(v) for v in ids[0]]
