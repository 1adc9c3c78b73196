"""Edge-path engine tests: left-padded prompts, anole fixed-length images,
sample_horizon drafts."""

import jax
import jax.numpy as jnp
import numpy as np

from sjd_tpu.core import EngineConfig, GrammarSpec, SamplingParams, SJDEngine
from sjd_tpu.models import decoder_model_fns

from helpers import TINY, make_engine, tiny_params


def test_left_padded_prompt_matches_unpadded():
    """Per-sample valid masks + position ids must make left padding
    transparent (the reference left-pads Emu3 CFG batches)."""
    params = tiny_params()
    eng = make_engine(
        window=4, scheme="jacobi", max_len=24,
        sampling=SamplingParams(do_cfg=False, greedy=True,
                                image_top_k=64, text_top_k=64),
    )
    plain = eng.generate(params, jax.random.PRNGKey(0),
                         jnp.asarray([[5, 6, 7]], jnp.int32))

    padded = jnp.asarray([[0, 0, 5, 6, 7]], jnp.int32)
    mask = jnp.asarray([[False, False, True, True, True]])
    res = eng.generate(params, jax.random.PRNGKey(0), padded, prompt_mask=mask)

    np.testing.assert_array_equal(
        np.asarray(res.tokens[0, 5 : int(res.length[0])]),
        np.asarray(plain.tokens[0, 3 : int(plain.length[0])]),
    )
    assert int(res.nfe) == int(plain.nfe)


def test_anole_fixed_length_image():
    """Anole grammar: exactly image_seq_length image tokens after <boi>,
    then a forced <eoi> (jacobi_iteration_anhole.py behavior)."""
    spec = GrammarSpec(
        kind="anole", image_start_id=48, image_end_id=49,
        image_vocab_start=4, image_vocab_end=47, image_seq_length=12,
    )
    model = decoder_model_fns(TINY, max_positions=512)
    eng = SJDEngine(
        model,
        EngineConfig(window=5, max_len=40, eos_id=63, cfg_mode="none"),
        spec,
        SamplingParams(do_cfg=False, image_top_k=40, text_top_k=10),
    )
    params = tiny_params()
    prompt = jnp.asarray([[1, 2, 48]], jnp.int32)  # ends with <boi>
    res = eng.generate(params, jax.random.PRNGKey(3), prompt)
    seq = res.tokens[0, 3:3 + 13].tolist()
    assert all(4 <= t <= 47 for t in seq[:12]), seq
    assert seq[12] == 49, seq


def test_sample_horizon_runs_and_respects_grammar():
    from sjd_tpu.core.grammar import GrammarSpec as GS

    spec = GS(kind="lumina", image_start_id=48, image_end_id=49,
              newline_id=50, image_vocab_start=4, image_vocab_end=47,
              size_token_base=52, grid_scale=2)
    model = decoder_model_fns(TINY, max_positions=512)
    eng = SJDEngine(
        model,
        EngineConfig(window=6, init="sample_horizon", max_len=60, eos_id=63),
        spec,
        SamplingParams(do_cfg=False, image_top_k=40, text_top_k=10),
    )
    params = tiny_params()
    prompt = jnp.asarray([[1, 2, 48, 54, 54]], jnp.int32)  # h=w=4
    res = eng.generate(params, jax.random.PRNGKey(5), prompt)
    seq = res.tokens[0, 5:5 + 21].tolist()
    assert all(seq[i] == 50 for i in (4, 9, 14, 19)), seq  # eol forced
    assert seq[20] == 49  # eoi at grid end


def test_bucketed_attention_matches_full():
    """attn_buckets (length-limited lax.switch attention) must not change
    generation — greedy trajectories bit-match the full-buffer path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sjd_tpu.core import EngineConfig, GrammarSpec, SamplingParams, SJDEngine
    from sjd_tpu.models import decoder_model_fns, init_params

    from helpers import TINY, tiny_params

    params = tiny_params()
    outs = {}
    for buckets in (0, 8):
        cfg = dataclasses.replace(TINY, attn_buckets=buckets)  # 8 -> multi-chunk
        model = decoder_model_fns(cfg, max_positions=512)
        eng = SJDEngine(
            model,
            EngineConfig(window=5, scheme="speculative_jacobi", max_len=30),
            # max_len 30, W 5, P 3 -> kv_buf rounds to a multiple of 8, so
            # attn_buckets=8 exercises the MULTI-chunk flash-decode path
            GrammarSpec(kind="none", image_vocab_start=0, image_vocab_end=63),
            SamplingParams(do_cfg=False, greedy=True, image_top_k=64,
                           text_top_k=64),
        )
        res = eng.generate(params, jax.random.PRNGKey(3),
                           jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32))
        outs[buckets] = np.asarray(res.tokens)
    np.testing.assert_array_equal(outs[0], outs[8])


def test_neg_prompt_longer_than_positive():
    """cfg_mode="neg_prompt" left-pads BOTH prompts to their common width;
    the token/KV buffers must budget for that width — a negative prompt much
    longer than the positive one used to overflow the buffer (crash) or trip
    the room guard early (silently truncated generation)."""
    import numpy as np

    eng = make_engine(window=4, max_len=24, cfg_mode="neg_prompt")
    params = tiny_params()
    pos = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    neg = jnp.asarray([list(range(1, 41))], jnp.int32)  # Pn=40 >> P=4
    res = eng.generate(params, jax.random.PRNGKey(0), pos, neg_prompt=neg)
    toks = np.asarray(res.tokens)
    # full generation: real length reaches max_len (may overshoot < window)
    assert int(res.gen_count[0]) >= 24 - 4, int(res.gen_count[0])
    assert toks.max() < TINY.vocab_size and toks.min() >= 0


def test_emu3_engine_grammar_offsets_after_prompt():
    """End-to-end: an emu3-kind engine fed a realistic prompt (text then the
    <|image token|> marker) must force <eol>/<eof>/<eoi>/<eos> at offsets
    counted from the MARKER, not from the start of the prompt (the inflation
    regression shifted every offset by the prompt length)."""
    import numpy as np

    from sjd_tpu.core.grammar import GrammarSpec as GS, init_state

    spec = GS(kind="emu3", image_end_id=49, newline_id=50, eof_id=51,
              eos_id=62, pad_id=0, image_vocab_start=4, image_vocab_end=47,
              img_token_id=61)
    model = decoder_model_fns(TINY, max_positions=512)
    eng = SJDEngine(
        model,
        EngineConfig(window=6, max_len=40, eos_id=62),
        spec,
        SamplingParams(do_cfg=False, image_top_k=40, text_top_k=40),
    )
    h, w = 2, 4
    gstate = init_state(1, h_lat=jnp.asarray([h], jnp.int32),
                        w_lat=jnp.asarray([w], jnp.int32))
    prompt = jnp.asarray([[1, 2, 3, 7, 61]], jnp.int32)  # marker last
    res = eng.generate(tiny_params(), jax.random.PRNGKey(2), prompt,
                       gstate=gstate)
    seq = np.asarray(res.tokens)[0, 5:5 + 13].tolist()
    # p=1..4 visual, p=5 eol, p=6..9 visual, p=10 eol, then eof eoi eos
    assert seq[4] == 50 and seq[9] == 50, seq
    assert seq[10] == 51 and seq[11] == 49 and seq[12] == 62, seq
    assert all(4 <= t <= 47 for t in seq[:4] + seq[5:9]), seq
