"""Sequential window decomposer parity (round-5 verdict #9).

The oracle is a per-token python loop: at each window row, apply the grammar
with the CURRENT state, sample (greedy), commit into update_state — exactly
the reference's input_ids_cum walk (SequenceSegmentDecomposer,
scheduler/logit_processor_3dim.py:457-511). The decomposer's lax.scan must
match it token for token, and must see MID-WINDOW state changes (an
<image_start> + grid-size header sampled inside the window arms the grammar
for later rows) that the main window path deliberately does not."""

import jax
import jax.numpy as jnp
import numpy as np

from sjd_tpu.core import grammar as G
from sjd_tpu.core import sampling as S
from sjd_tpu.core.decomposer import sequential_decompose
from sjd_tpu.core.processors import SamplingParams

V = 64
SPEC = G.GrammarSpec(
    kind="lumina", image_start_id=48, image_end_id=49, newline_id=50,
    image_vocab_start=4, image_vocab_end=47, size_token_base=52, grid_scale=2,
)
PARAMS = SamplingParams(do_cfg=False, image_top_k=64, text_top_k=64)


def _oracle_greedy(logits, spec, gstate, params):
    """Per-token loop: grammar -> top-k -> argmax -> update_state."""
    B, W, _ = logits.shape
    gs = gstate
    toks = []
    for i in range(W):
        sc = logits[:, i, :]
        if params.temperature != 1.0:
            sc = sc / params.temperature
        sc = G.apply_grammar(spec, gs, sc[:, None, :])[:, 0, :]
        sc = S.top_k_dual(sc[:, None, :], gs.in_image,
                          params.image_top_k, params.text_top_k)[:, 0, :]
        tok = jnp.argmax(jax.nn.softmax(sc, -1), -1).astype(jnp.int32)
        gs = G.update_state(spec, gs, tok[:, None], jnp.ones((B,), jnp.int32))
        toks.append(tok)
    return jnp.stack(toks, axis=1), gs


def test_greedy_matches_per_token_loop():
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (2, 8, V), jnp.float32)
    gstate = G.GrammarState(
        in_image=jnp.asarray([True, True]),
        size_known=jnp.asarray([True, True]),
        h_lat=jnp.asarray([4, 2], jnp.int32),
        w_lat=jnp.asarray([4, 2], jnp.int32),
        img_count=jnp.asarray([2, 0], jnp.int32),
        header_seen=jnp.asarray([2, 2], jnp.int32),
    )
    res = sequential_decompose(rng, logits, SPEC, gstate, PARAMS, greedy=True)
    want_toks, want_gs = _oracle_greedy(logits, SPEC, gstate, PARAMS)
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(want_toks))
    for a, b in zip(res.gstate, want_gs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # fix_logits semantics: each row's score collapses to the sampled one-hot
    oh = np.asarray(res.fixed_scores)
    assert oh.shape == (2, 8, V)
    np.testing.assert_array_equal(oh.argmax(-1), np.asarray(res.tokens))
    np.testing.assert_allclose(oh.sum(-1), 1.0)


def test_midwindow_image_start_arms_grammar():
    """The decomposer's whole point vs the window path: a header sampled
    INSIDE the window conditions later rows. Build logits that greedily emit
    <image_start> <h=54> <w=53> then junk; rows after the header must be
    forced into the image grammar (image vocab / <eol> at the tiny grid's
    row end), which the window path (window-start state) would not do."""
    W = 9
    logits = np.full((1, W, V), -10.0, np.float32)
    logits[0, 0, 48] = 10.0   # <image_start>
    logits[0, 1, 54] = 10.0   # h token -> h_lat 4
    logits[0, 2, 53] = 10.0   # w token -> w_lat 2
    # remaining rows prefer a TEXT token (id 60) which the armed grammar
    # must suppress inside the image; second-best is image token 7
    logits[0, 3:, 60] = 10.0
    logits[0, 3:, 7] = 5.0
    gstate = G.init_state(1)
    res = sequential_decompose(
        jax.random.PRNGKey(0), jnp.asarray(logits), SPEC, gstate, PARAMS,
        greedy=True,
    )
    toks = res.tokens[0].tolist()
    assert toks[:3] == [48, 54, 53], toks
    # grid w_lat=2 -> row stride 3: offsets 0,1 image; offset 2 <eol>; ...
    assert toks[3] == 7 and toks[4] == 7, toks      # image vocab forced
    assert toks[5] == 50, toks                       # <eol> at offset 2
    assert toks[6] == 7 and toks[7] == 7, toks
    assert toks[8] == 50, toks                       # next row end
    assert bool(res.gstate.in_image[0])
    assert int(res.gstate.img_count[0]) == 6


def test_stochastic_rows_sample_from_constrained_dist():
    """Non-greedy: every sampled token must be legal under the per-row
    constrained dist (image vocab inside the grid, <eol> at row ends)."""
    gstate = G.GrammarState(
        in_image=jnp.asarray([True]), size_known=jnp.asarray([True]),
        h_lat=jnp.asarray([4], jnp.int32), w_lat=jnp.asarray([4], jnp.int32),
        img_count=jnp.asarray([0], jnp.int32),
        header_seen=jnp.asarray([2], jnp.int32),
    )
    logits = jax.random.normal(jax.random.PRNGKey(2), (1, 10, V), jnp.float32)
    res = sequential_decompose(
        jax.random.PRNGKey(3), logits, SPEC, gstate, PARAMS, greedy=False)
    toks = res.tokens[0].tolist()
    for i, t in enumerate(toks):
        if (i + 1) % 5 == 0:
            assert t == 50, (i, toks)
        else:
            assert 4 <= t <= 47, (i, toks)


def test_cfg_mix_collapses_doubled_batch():
    params = SamplingParams(do_cfg=True, guidance_scale=3.0,
                            image_top_k=64, text_top_k=64)
    gstate = G.init_state(1)
    logits = jax.random.normal(jax.random.PRNGKey(4), (2, 4, V), jnp.float32)
    res = sequential_decompose(
        jax.random.PRNGKey(5), logits, SPEC, gstate, params, greedy=True)
    assert res.tokens.shape == (1, 4)
