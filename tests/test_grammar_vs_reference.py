"""Grammar parity against the reference MultiTokensVLLogitsProcessor
(scheduler/logit_processor_3dim.py:45-155), imported read-only as an oracle:
for every committed-length phase, the window scores masked by this repo's
position-pure grammar must equal the reference's stateful processor output.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import transformers.generation.logits_process as _lp  # noqa: E402

if not hasattr(_lp, "LogitsWarper"):
    _lp.LogitsWarper = _lp.LogitsProcessor

from sjd_tpu.core import grammar as G  # noqa: E402

V = 8806 + 50  # enough room for lumina's size tokens
W = 7


def _spec():
    return G.GrammarSpec(
        kind="lumina",
        image_start_id=8197,
        image_end_id=8196,
        newline_id=8803,
        image_vocab_start=4,
        image_vocab_end=8195,
        size_token_base=8804,
        grid_scale=2,
    )


def test_window_grammar_matches_reference_processor():
    from scheduler.logit_processor_3dim import MultiTokensVLLogitsProcessor

    spec = _spec()
    h_grids = w_grids = 2  # latent 4x4 grid
    rs = np.random.RandomState(0)

    # committed ids: prompt, <image_start>, size tokens, then n image tokens
    # laid out with <eol> every 5th (the processor re-derives everything from
    # these ids; this repo's grammar state is updated incrementally)
    header = [11, 12, 8197, 8804 + h_grids, 8804 + w_grids]
    body_full = []
    for r in range(4):
        body_full += list(rs.randint(4, 8196, size=4)) + [8803]

    for n_body in range(0, 18):
        ids = header + body_full[:n_body]
        scores = rs.randn(1, W, V).astype(np.float32)

        ref_proc = MultiTokensVLLogitsProcessor(
            image_start_token_id=8197, image_end_token_id=8196,
            image_next_line_token_id=8803, patch_size=32, voc_size=V,
        )
        want = ref_proc(
            torch.tensor([ids]), torch.tensor(scores.copy())
        ).numpy()

        st = G.init_state(1)
        st = G.update_state(
            spec, st, jnp.asarray([ids], jnp.int32),
            jnp.asarray([len(ids)], jnp.int32),
        )
        got = np.asarray(G.apply_grammar(spec, st, jnp.asarray(scores)))

        # compare allowed-token masks and untouched values
        want_mask = np.isfinite(want) & (want > -1e30)
        got_mask = np.isfinite(got) & (got > -1e30)
        np.testing.assert_array_equal(got_mask, want_mask, err_msg=f"n_body={n_body}")
        # where both keep the score, values must be identical (forced rows set
        # the kept token's score to 0 in both implementations)
        np.testing.assert_allclose(
            got[got_mask], want[want_mask], rtol=1e-6, err_msg=f"n_body={n_body}"
        )


def test_header_inside_window_matches_reference():
    """The image header (<image_start> h w) sits in the DRAFT WINDOW, not in
    the committed ids. The reference's processors receive committed ids only
    (all_collected_input_ids = input_ids, jacobi_iteration_lumina_mgpt.py:
    1078-1079 — the window lives in model_inputs['input_ids']), so neither
    implementation constrains the window rows this step: committed-only
    grammar arming is bit-parity, not a divergence (VERDICT r1 item 7)."""
    from scheduler.logit_processor_3dim import MultiTokensVLLogitsProcessor

    spec = _spec()
    rs = np.random.RandomState(3)

    # committed ids end BEFORE the image header; the header tokens are drafts
    ids = [11, 12, 13]
    scores = rs.randn(1, W, V).astype(np.float32)

    ref_proc = MultiTokensVLLogitsProcessor(
        image_start_token_id=8197, image_end_token_id=8196,
        image_next_line_token_id=8803, patch_size=32, voc_size=V,
    )
    want = ref_proc(torch.tensor([ids]), torch.tensor(scores.copy())).numpy()

    st = G.init_state(1)
    st = G.update_state(
        spec, st, jnp.asarray([ids], jnp.int32),
        jnp.asarray([len(ids)], jnp.int32),
    )
    got = np.asarray(G.apply_grammar(spec, st, jnp.asarray(scores)))

    np.testing.assert_allclose(got, want)  # both leave the window untouched
    np.testing.assert_allclose(got, scores)

    # once those header tokens COMMIT, the very next step constrains rows in
    # both implementations identically (mid-generation arming)
    ids2 = ids + [8197, 8804 + 2, 8804 + 2]  # 4x4 latent grid
    scores2 = rs.randn(1, W, V).astype(np.float32)
    want2 = ref_proc(torch.tensor([ids2]), torch.tensor(scores2.copy())).numpy()
    st2 = G.update_state(
        spec, st, jnp.asarray([ids2[len(ids):]], jnp.int32),
        jnp.asarray([3], jnp.int32),
    )
    got2 = np.asarray(G.apply_grammar(spec, st2, jnp.asarray(scores2)))
    want_mask = np.isfinite(want2) & (want2 > -1e30)
    got_mask = np.isfinite(got2) & (got2 > -1e30)
    np.testing.assert_array_equal(got_mask, want_mask)
    np.testing.assert_allclose(got2[got_mask], want2[want_mask], rtol=1e-6)
