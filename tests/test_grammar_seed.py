"""Grammar-aware draft seeding (round-5 verdict item #1).

The grammar knows, before the forward, that certain window offsets force a
single token with probability 1 (<eol> at row ends, <eof>/<eoi>/<eos>/<pad>
past the grid — emu3/mllm/utils_emu3.py:19-62,
scheduler/logit_processor_3dim.py:107-155). A random draft seed at such an
offset has p_new(seed) = 0 -> certain rejection, so every reference window
crossing a row boundary caps its acceptance there. Pre-placing the forced
token with a one-hot draft dist makes those slots certain ACCEPTS instead
(ratio p_new/p_draft = 1). Output law is untouched — speculative sampling is
draft-agnostic — which these tests pin down:

  1. forced_token_at must agree bit-for-bit with apply_grammar's one-hot rows
     (including degenerate-grid force-precedence).
  2. Greedy decode is bit-identical with seeding on/off.
  3. Seeding strictly reduces NFE on grammar families.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sjd_tpu.core import EngineConfig, GrammarSpec, SamplingParams, SJDEngine
from sjd_tpu.core import grammar as G
from sjd_tpu.models import decoder_model_fns

from helpers import TINY, TINY_GRAMMAR, tiny_params

V = 64


def _state(img_count, h, w, in_image=True, size_known=True):
    return G.GrammarState(
        in_image=jnp.asarray([in_image]),
        size_known=jnp.asarray([size_known]),
        h_lat=jnp.asarray([h], jnp.int32),
        w_lat=jnp.asarray([w], jnp.int32),
        img_count=jnp.asarray([img_count], jnp.int32),
        header_seen=jnp.asarray([2], jnp.int32),
    )


def _oracle_forced(spec, state, W):
    """Per-row (forced, token) derived from apply_grammar itself: a row is
    forced iff exactly one vocab entry stays finite."""
    out = np.asarray(G.apply_grammar(spec, state, jnp.zeros((1, W, V))))
    forced, tok = [], []
    for i in range(W):
        allowed = np.nonzero(out[0, i] > G.NEG_INF / 2)[0]
        forced.append(len(allowed) == 1)
        tok.append(int(allowed[0]) if len(allowed) == 1 else 0)
    return np.asarray(forced), np.asarray(tok, np.int32)


def _check_parity(spec, state, W):
    want_f, want_t = _oracle_forced(spec, state, W)
    o = state.img_count[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    got_f, got_t = G.forced_token_at(spec, state, o)
    got_f, got_t = np.asarray(got_f[0]), np.asarray(got_t[0])
    np.testing.assert_array_equal(got_f, want_f)
    np.testing.assert_array_equal(got_t[got_f], want_t[want_f])


@pytest.mark.parametrize("h,w", [(4, 4), (2, 3), (3, 1), (2, 2), (1, 1)])
def test_forced_matches_apply_grammar_lumina(h, w):
    spec = TINY_GRAMMAR
    for count in range(0, (w + 1) * h + 4):
        _check_parity(spec, _state(count, h, w), W=8)


@pytest.mark.parametrize("h,w", [(2, 3), (3, 2), (2, 1), (2, 2)])
def test_forced_matches_apply_grammar_emu3(h, w):
    spec = GrammarSpec(
        kind="emu3", image_end_id=58, newline_id=57, eof_id=59, eos_id=60,
        pad_id=61, image_vocab_start=4, image_vocab_end=47,
    )
    for count in range(0, (w + 1) * h + 8):
        _check_parity(spec, _state(count, h, w), W=8)


@pytest.mark.parametrize("mode", ["image-only", "interleaved"])
def test_forced_matches_apply_grammar_anole(mode):
    spec = GrammarSpec(
        kind="anole", image_start_id=48, image_end_id=49,
        image_vocab_start=4, image_vocab_end=47, image_seq_length=10,
        mode=mode, eos_id=63,
    )
    for count in range(0, 14):
        _check_parity(spec, _state(count, 0, 0), W=6)


def test_forced_inactive_outside_image():
    f, t = G.forced_token_at(
        TINY_GRAMMAR, _state(4, 4, 4, in_image=False),
        jnp.arange(8, dtype=jnp.int32)[None, :],
    )
    assert not bool(np.asarray(f).any())
    spec = GrammarSpec(kind="anole", image_end_id=49, image_vocab_start=4,
                       image_vocab_end=47, mode="text-only")
    f, _ = G.forced_token_at(spec, _state(4, 0, 0),
                             jnp.arange(8, dtype=jnp.int32)[None, :])
    assert not bool(np.asarray(f).any())


def _grammar_engine(grammar_seed, *, greedy, init="random", window=6,
                    max_len=60):
    model = decoder_model_fns(TINY, max_positions=512)
    eng = SJDEngine(
        model,
        EngineConfig(window=window, init=init, max_len=max_len, eos_id=63,
                     grammar_seed=grammar_seed),
        TINY_GRAMMAR,
        SamplingParams(do_cfg=False, greedy=greedy, image_top_k=40,
                       text_top_k=10),
    )
    return eng


def test_greedy_bitmatch_with_and_without_seeding():
    """Seeding must not change greedy output — only how fast it converges.
    Greedy is deterministic, so the NFE reduction here is an exact property,
    not a statistical one: a random image-vocab seed can never match the
    forced <eol>/<eoi> argmax (they're outside the image vocab), while the
    pre-placed forced token always does."""
    params = tiny_params()
    prompt = jnp.asarray([[1, 2, 48, 54, 54]], jnp.int32)  # h=w=4 grid
    on = _grammar_engine(True, greedy=True, max_len=21).generate(
        params, jax.random.PRNGKey(0), prompt)
    off = _grammar_engine(False, greedy=True, max_len=21).generate(
        params, jax.random.PRNGKey(0), prompt)
    L = min(int(on.length[0]), int(off.length[0]))
    np.testing.assert_array_equal(
        np.asarray(on.tokens[0, :L]), np.asarray(off.tokens[0, :L]))
    # strictly more tokens per forward (a final multi-commit may overshoot
    # max_len, so compare throughput, not NFE-to-budget)
    thr_on = int(on.gen_count[0]) / int(on.nfe)
    thr_off = int(off.gen_count[0]) / int(off.nfe)
    assert thr_on > thr_off, (thr_on, thr_off)


@pytest.mark.parametrize("init", ["random", "repeat_horizon"])
def test_seeding_stochastic_output_stays_grammar_valid(init):
    """Stochastic decode with seeding: every row ends in <eol> at exactly the
    forced offsets and the grid closes with <eoi> — the seeded one-hot draft
    dists must not perturb the output law. (NFE reduction is asserted on the
    deterministic greedy path above — on a TINY RANDOM model the stochastic
    NFE difference is within seed noise, measured both ways on CPU and TPU;
    on real weights the row-boundary cap is the binding constraint and the
    reduction is measured in the flagship bench artifacts.)"""
    params = tiny_params()
    prompt = jnp.asarray([[1, 2, 48, 54, 54]], jnp.int32)
    on_eng = _grammar_engine(True, greedy=False, init=init, max_len=21)
    for seed in range(4):
        on = on_eng.generate(params, jax.random.PRNGKey(seed), prompt)
        seq = on.tokens[0, 5:5 + 21].tolist()
        assert all(seq[i] == 50 for i in (4, 9, 14, 19)), seq
        assert seq[20] == 49, seq
        assert all(4 <= seq[i] <= 47 for i in range(20)
                   if i not in (4, 9, 14, 19)), seq


def test_seeding_with_emu3_grammar_runs_valid():
    """Emu3 grammar + seeding: forced eol/eof/eoi/eos land exactly on the
    reference offsets (utils_emu3.py:19-62) in a live decode."""
    from sjd_tpu.core.grammar import init_state

    spec = GrammarSpec(
        kind="emu3", image_end_id=58, newline_id=57, eof_id=59, eos_id=60,
        pad_id=61, image_vocab_start=4, image_vocab_end=47, img_token_id=56,
    )
    model = decoder_model_fns(TINY, max_positions=512)
    eng = SJDEngine(
        model,
        EngineConfig(window=5, max_len=16, eos_id=60, grammar_seed=True),
        spec,
        SamplingParams(do_cfg=False, image_top_k=40, text_top_k=10),
    )
    params = tiny_params()
    # prompt ends with the <|image token|> marker; grid 2x3 known up front
    prompt = jnp.asarray([[1, 30, 31, 55, 12, 56]], jnp.int32)
    gstate = init_state(1, h_lat=jnp.asarray([2], jnp.int32),
                        w_lat=jnp.asarray([3], jnp.int32))
    res = eng.generate(params, jax.random.PRNGKey(7), prompt, gstate=gstate)
    seq = res.tokens[0, 6:6 + 11].tolist()
    # p = offset+1: eol at 4 and 8, then eof, eoi, eos
    assert seq[3] == 57 and seq[7] == 57, seq
    assert seq[8] == 59 and seq[9] == 58 and seq[10] == 60, seq
