"""Regression tests for the round-1 advisor findings (ADVICE.md r1).

1. (high) CFG must be live for grammarless models (LlamaGen): the reference
   applies CFG unconditionally when the processor stack has no
   image_start_token_id (check_is_force_no_cfg returns False,
   scheduler/jacobi_iteration_lumina_mgpt.py:70-80) — different guidance
   scales must change greedy output.
2. (medium) do_cfg with guidance_scale == 1.0 must not crash: the engine
   normalizes do_cfg off (the CFG mix is the identity at scale 1.0).
3. (medium) Token/KV buffer sizing must account for left-pad rows: a batch
   with heavy left-padding generating to max_len must not clamp
   dynamic_update_slice offsets and overwrite committed tokens.
4. (low) resume() must keep making progress past 4x nfe_cap (no hidden
   clamp), and distinct max_steps values must not recompile the loop.
"""

import jax
import jax.numpy as jnp

from sjd_tpu.core import EngineConfig, GrammarSpec, SamplingParams, SJDEngine
from sjd_tpu.models import decoder_model_fns

from helpers import TINY, make_engine, tiny_params


def test_cfg_live_for_grammarless_models():
    """spec.kind == 'none' (LlamaGen) must never disable CFG."""
    outs = {}
    params = tiny_params()
    for scale in (2.0, 50.0):
        eng = make_engine(
            window=4,
            max_len=24,
            cfg_mode="neg_prompt",
            sampling=SamplingParams(
                do_cfg=True, guidance_scale=scale, image_top_k=64,
                text_top_k=64, greedy=True,
            ),
        )
        prompt = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
        neg = jnp.asarray([[3, 1, 1, 1]], jnp.int32)
        res = eng.generate(params, jax.random.PRNGKey(0), prompt, neg_prompt=neg)
        outs[scale] = [int(v) for v in res.tokens[0, : int(res.length[0])]]
    assert outs[2.0] != outs[50.0], (
        "greedy output identical across guidance scales — CFG is dead"
    )


def test_cfg_scale_one_no_crash():
    """guidance_scale == 1.0 with do_cfg=True used to leak a [2B, W, V]
    tensor into acceptance (ValueError); it must run and match no-CFG."""
    params = tiny_params()
    prompt = jnp.asarray([[3, 5, 7, 9]], jnp.int32)

    eng_cfg1 = make_engine(
        window=4, max_len=20, cfg_mode="mask_prompt",
        sampling=SamplingParams(do_cfg=True, guidance_scale=1.0,
                                image_top_k=64, text_top_k=64, greedy=True),
    )
    res1 = eng_cfg1.generate(params, jax.random.PRNGKey(0), prompt)

    eng_nocfg = make_engine(
        window=4, max_len=20, cfg_mode="none",
        sampling=SamplingParams(do_cfg=False, image_top_k=64, text_top_k=64,
                                greedy=True),
    )
    res0 = eng_nocfg.generate(params, jax.random.PRNGKey(0), prompt)

    assert eng_cfg1._S_factor == 1
    got1 = [int(v) for v in res1.tokens[0, : int(res1.length[0])]]
    got0 = [int(v) for v in res0.tokens[0, : int(res0.length[0])]]
    assert got1 == got0


def test_left_padded_batch_fills_to_max_len_without_clobber():
    """Heavily left-padded rows must reach max_len with the prompt intact —
    commit writes land at pad + real offsets, which exceed max_len + W + 1
    (the old default buffer) well before the finish check fires."""
    params = tiny_params()
    max_len = 24
    eng = make_engine(window=6, max_len=max_len)
    P = 12
    # row 0: 2 real tokens, 10 pad rows; row 1: full prompt
    prompt = jnp.asarray([[0] * 10 + [3, 5], list(range(2, 14))], jnp.int32)
    mask = jnp.asarray([[False] * 10 + [True] * 2, [True] * 12])
    res = eng.generate(params, jax.random.PRNGKey(1), prompt, prompt_mask=mask)

    toks0 = [int(v) for v in res.tokens[0]]
    assert toks0[10:12] == [3, 5], "prompt overwritten by clamped commit"
    real0 = int(res.length[0]) - 10
    real1 = int(res.length[1])
    assert real0 >= max_len, f"row 0 stopped early at real length {real0}"
    assert real1 >= max_len
    # every committed row stayed inside the buffer
    assert int(res.length.max()) <= res.tokens.shape[1]


def test_resume_past_4x_cap_and_no_recompile():
    """Chunked resume must progress indefinitely, and changing max_steps must
    reuse the compiled loop (nfe_cap is a traced operand)."""
    params = tiny_params()
    eng = make_engine(window=4, max_len=40)
    prompt = jnp.asarray([[3, 5, 7]], jnp.int32)

    traces = {"n": 0}
    orig = eng._continue_impl

    def counting(*a, **k):
        traces["n"] += 1
        return orig(*a, **k)

    eng._continue_impl = counting
    eng._continue = jax.jit(counting)

    res, state = eng.generate(params, jax.random.PRNGKey(0), prompt,
                              max_steps=2, return_state=True)
    nfe_cap = eng.config.resolved_nfe_cap()
    chunks = 0
    # drive way past 4x nfe_cap total budget in tiny uneven chunks
    for k in (1, 2, 3, 1, 2, 3, 1, 2):
        prev = int(state.nfe)
        res, state = eng.resume(params, state, max_steps=k, return_state=True)
        chunks += 1
        if bool(jnp.all(state.finished)):
            break
        assert int(state.nfe) > prev, (
            f"resume stalled at nfe={prev} (hidden clamp?)"
        )
    # traced nfe_cap: _continue_impl traced at most twice (inside _generate's
    # trace and once standalone for resume), regardless of max_steps values
    assert traces["n"] <= 2, f"recompiled per max_steps: {traces['n']} traces"


def test_ar_fast_path_bit_matches_wide_steps():
    """Out-of-interval steps take a width-1 forward (lax.cond fast path); with
    greedy decoding the result must bit-match the always-W-wide round-1
    behavior (active_w=1 made the wide forward compute the same one token)."""
    results = {}
    params = tiny_params()
    prompt = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
    for fast in (True, False):
        eng = make_engine(
            window=6, max_len=28, interval_r=8,
            sampling=SamplingParams(do_cfg=False, image_top_k=64,
                                    text_top_k=64, greedy=True),
        )
        eng.ar_fast_path = fast
        res = eng.generate(params, jax.random.PRNGKey(0), prompt)
        results[fast] = (
            [int(v) for v in res.tokens[0, : int(res.length[0])]],
            int(res.nfe), int(res.steps_multi),
        )
    assert results[True][0] == results[False][0]
    # interval_r=8: steps past prompt+8 are AR; multi-step count must agree
    assert results[True][2] == results[False][2]
