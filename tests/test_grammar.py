"""Grammar tests: eol/eoi forcing at exact grid offsets for every window
phase — the reference's check_eol_in_multitokens behavior
(scheduler/logit_processor_3dim.py:25-43, 107-155) as a position-pure fn."""

import jax.numpy as jnp
import numpy as np

from sjd_tpu.core import grammar as G

V = 64
SPEC = G.GrammarSpec(
    kind="lumina",
    image_start_id=48,
    image_end_id=49,
    newline_id=50,
    image_vocab_start=4,
    image_vocab_end=47,
    size_token_base=52,
    grid_scale=2,
)


def _state(img_count, h=4, w=4, in_image=True, size_known=True, B=1):
    return G.GrammarState(
        in_image=jnp.full((B,), in_image),
        size_known=jnp.full((B,), size_known),
        h_lat=jnp.full((B,), h, jnp.int32),
        w_lat=jnp.full((B,), w, jnp.int32),
        img_count=jnp.asarray(
            [img_count] * B if np.isscalar(img_count) else img_count, jnp.int32
        ),
        header_seen=jnp.full((B,), 2, jnp.int32),
    )


def _allowed(scores_row):
    return np.nonzero(np.asarray(scores_row) > G.NEG_INF / 2)[0]


def test_eol_forced_every_row_for_all_window_phases():
    """For a 4x4 grid (row stride 5), the predicted token at image offset o
    must be <eol> iff (o+1) % 5 == 0, for every (img_count, window row)."""
    W = 6
    for count in range(0, 12):
        state = _state(count)
        scores = jnp.zeros((1, W, V))
        out = np.asarray(G.apply_grammar(SPEC, state, scores))
        for i in range(W):
            o = count + i
            allowed = _allowed(out[0, i])
            if o == 5 * 4:  # (w+1)*h -> <image_end>
                assert list(allowed) == [49], (count, i, allowed)
            elif (o + 1) % 5 == 0:
                assert list(allowed) == [50], (count, i, allowed)
            elif o < 20:
                assert allowed.min() >= 4 and allowed.max() <= 47, (count, i)


def test_no_constraints_outside_image():
    state = _state(0, in_image=False, size_known=False)
    scores = jnp.zeros((1, 4, V))
    out = np.asarray(G.apply_grammar(SPEC, state, scores))
    assert (out == 0).all()


def test_no_constraints_before_size_known():
    state = _state(0, in_image=True, size_known=False)
    scores = jnp.zeros((1, 4, V))
    out = np.asarray(G.apply_grammar(SPEC, state, scores))
    assert (out == 0).all()


def test_state_update_collects_grid_size():
    """<image_start> <h_tok> <w_tok> sequence resolves latent dims h*2, w*2
    (logit_processor_3dim.py:107-111)."""
    st = G.init_state(1)
    committed = jnp.asarray([[48, 54, 53, 7, 8]], jnp.int32)  # start, h=2, w=1
    st = G.update_state(SPEC, st, committed, jnp.asarray([5], jnp.int32))
    assert bool(st.in_image[0])
    assert bool(st.size_known[0])
    assert int(st.h_lat[0]) == 4  # (54-52)*2
    assert int(st.w_lat[0]) == 2  # (53-52)*2
    assert int(st.img_count[0]) == 2  # the two body tokens


def test_state_update_closes_image():
    st = G.init_state(1)
    committed = jnp.asarray([[48, 54, 53, 7, 49]], jnp.int32)
    st = G.update_state(SPEC, st, committed, jnp.asarray([5], jnp.int32))
    assert not bool(st.in_image[0])
    assert int(st.img_count[0]) == 0


def test_state_update_respects_live_count():
    """Tokens past n_committed are ignored."""
    st = G.init_state(1)
    committed = jnp.asarray([[48, 54, 53, 7, 49]], jnp.int32)
    st = G.update_state(SPEC, st, committed, jnp.asarray([3], jnp.int32))
    assert bool(st.in_image[0])
    assert bool(st.size_known[0])
    assert int(st.img_count[0]) == 0  # only header committed


def test_emu3_grammar_offsets():
    """Emu3: eol at p % (w+1) == 0; eof/eoi/eos/pad at the exact offsets past
    the grid end (emu3/mllm/utils_emu3.py:19-62)."""
    spec = G.GrammarSpec(
        kind="emu3",
        image_start_id=-1,
        image_end_id=58,
        newline_id=57,
        eof_id=59,
        eos_id=60,
        pad_id=61,
        image_vocab_start=4,
        image_vocab_end=47,
    )
    h, w = 2, 3  # grid end at p = (w+1)*h = 8
    state = G.GrammarState(
        in_image=jnp.asarray([True]),
        size_known=jnp.asarray([True]),
        h_lat=jnp.asarray([h], jnp.int32),
        w_lat=jnp.asarray([w], jnp.int32),
        img_count=jnp.asarray([0], jnp.int32),
        header_seen=jnp.asarray([2], jnp.int32),
    )
    W = 13
    out = np.asarray(G.apply_grammar(spec, state, jnp.zeros((1, W, V))))
    # note offset 11 (p=12, divisible by w+1=4): the reference forces <eol>
    # even past the image end (eol has first priority, utils_emu3.py:45-46)
    expected = {3: [57], 7: [57], 8: [59], 9: [58], 10: [60], 11: [57], 12: [61]}
    for i in range(W):
        allowed = _allowed(out[0, i])
        if i in expected:
            assert list(allowed) == expected[i], (i, allowed)
        else:
            assert allowed.min() >= 4 and allowed.max() <= 47, (i, allowed)


def test_anole_grammar():
    spec = G.GrammarSpec(
        kind="anole",
        image_start_id=48,
        image_end_id=49,
        image_vocab_start=4,
        image_vocab_end=47,
        image_seq_length=9,
    )
    state = _state(6)
    W = 5
    out = np.asarray(G.apply_grammar(spec, state, jnp.zeros((1, W, V))))
    for i in range(W):
        o = 6 + i
        allowed = _allowed(out[0, i])
        if o == 9:
            assert list(allowed) == [49]
        elif o < 9:
            assert allowed.min() >= 4 and allowed.max() <= 47


def test_emu3_prompt_scan_arms_at_marker_without_counting():
    """The engine scans the full prompt through update_state; the emu3
    positional constraint must anchor at the <|image token|> marker
    (utils_emu3.py:47-50) — the prompt's own tokens used to inflate
    img_count by the prompt length, shifting every forced offset."""
    spec = G.GrammarSpec(
        kind="emu3",
        image_end_id=58, newline_id=57, eof_id=59, eos_id=60, pad_id=61,
        image_vocab_start=4, image_vocab_end=47, img_token_id=56,
    )
    state = G.init_state(
        1, h_lat=jnp.asarray([2], jnp.int32), w_lat=jnp.asarray([3], jnp.int32)
    )
    # bos + 9 text tokens + boi + size + MARKER (build_gen_prompt layout)
    prompt = jnp.asarray([[1] + list(range(30, 39)) + [55, 12, 56]], jnp.int32)
    mask = jnp.ones_like(prompt, bool)
    st = G.update_state(spec, state, prompt, mask)
    assert bool(st.in_image[0])  # armed by the marker
    assert int(st.img_count[0]) == 0  # nothing before/at the marker counted
    # generated tokens after the marker DO count
    st2 = G.update_state(spec, st, jnp.asarray([[5, 6]], jnp.int32),
                         jnp.asarray([2], jnp.int32))
    assert int(st2.img_count[0]) == 2
