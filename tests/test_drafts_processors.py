"""Draft-window construction and processor pipeline unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from sjd_tpu.core import GrammarSpec, SamplingParams
from sjd_tpu.core.drafts import build_window
from sjd_tpu.core.grammar import GrammarState
from sjd_tpu.core.processors import cfg_mix, process_window_logits
from sjd_tpu.core.sampling import top_k_dual, top_p

V = 64
SPEC = GrammarSpec(kind="none", image_vocab_start=4, image_vocab_end=47)


def _gstate(B, in_image=True, w=4, count=0):
    return GrammarState(
        in_image=jnp.full((B,), in_image),
        size_known=jnp.full((B,), True),
        h_lat=jnp.full((B,), 4, jnp.int32),
        w_lat=jnp.full((B,), w, jnp.int32),
        img_count=jnp.full((B,), count, jnp.int32),
        header_seen=jnp.full((B,), 2, jnp.int32),
    )


def _window_args(B=1, W=6, length=10):
    tokens = jnp.tile(jnp.arange(64, dtype=jnp.int32)[None, :], (B, 1))[:, :32]
    return dict(
        spec=SPEC,
        gstate=_gstate(B),
        tokens=tokens,
        length=jnp.full((B,), length, jnp.int32),
        last_prob=jnp.full((B, V), 1.0 / V),
        carried_tokens=jnp.zeros((B, W), jnp.int32),
        carried_probs=jnp.zeros((B, W, V)),
        carried_count=jnp.zeros((B,), jnp.int32),
        window=W,
        vocab_size=V,
    )


def test_window_slot0_is_last_committed():
    args = _window_args(length=10)
    win = build_window(jax.random.PRNGKey(0), scheme="random", **args)
    assert int(win.x[0, 0]) == 9  # tokens[length-1]
    # fresh drafts are in the image vocab with one-hot draft dists
    drafts = np.asarray(win.x[0, 1:])
    assert drafts.min() >= 4 and drafts.max() <= 47
    probs = np.asarray(win.p_draft[0, 1:])
    np.testing.assert_allclose(probs.sum(-1), 1.0)
    assert (probs.max(-1) == 1.0).all()  # one-hot (reference :502-514)


def test_window_carried_tokens_come_first():
    args = _window_args(W=6)
    carried = jnp.asarray([[11, 12, 13, 0, 0, 0]], jnp.int32)
    cprobs = jax.nn.one_hot(carried, V)
    args.update(carried_tokens=carried, carried_probs=cprobs,
                carried_count=jnp.asarray([3], jnp.int32))
    win = build_window(jax.random.PRNGKey(0), scheme="random", **args)
    np.testing.assert_array_equal(np.asarray(win.x[0, 1:4]), [11, 12, 13])


def test_repeat_horizon_copies_previous_token():
    """Fresh slots at grid column >= 1 copy the most recent available token
    (get_multi_token_for_preparation horizon path, :531-594)."""
    args = _window_args(W=6, length=10)
    # img_count=0 -> slot offsets o=0..4, w=4 -> col = (o+1)%5 -> slot with
    # col 0 is offset 4 (the eol position), others copy
    win = build_window(jax.random.PRNGKey(0), scheme="repeat_horizon", **args)
    x = np.asarray(win.x[0])
    # last committed token is 9, which is in image vocab -> copied forward
    assert (x[1:5] == 9).sum() >= 3


def test_cfg_mix_and_force_no_cfg():
    B, W = 2, 3
    cond = jnp.ones((B, W, V)) * 2.0
    uncond = jnp.ones((B, W, V)) * 1.0
    logits = jnp.concatenate([cond, uncond], axis=0)
    out = cfg_mix(logits, 3.0, jnp.asarray([False, True]))
    np.testing.assert_allclose(np.asarray(out[0]), 3.0 * (2 - 1) + 1)  # guided
    np.testing.assert_allclose(np.asarray(out[1]), 2.0)  # cond only


def test_top_k_dual_switches_on_image_mode():
    rs = np.random.RandomState(0)
    scores = jnp.asarray(rs.randn(2, 1, V).astype(np.float32))
    out = top_k_dual(scores, jnp.asarray([True, False]), image_top_k=32, text_top_k=4)
    kept = np.asarray(out > -1e30).sum(axis=-1)
    assert kept[0, 0] == 32 and kept[1, 0] == 4


def test_top_p_keeps_nucleus():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(top_p(logits, 0.8))
    assert np.isfinite(out[0, :2]).all()  # 0.5+0.3 = 0.8 kept
    assert out[0, 3] < -1e30  # tail dropped


def test_process_window_logits_normalizes():
    B, W = 1, 4
    logits = jnp.asarray(np.random.RandomState(1).randn(2 * B, W, V), jnp.float32)
    p = process_window_logits(
        logits, SPEC, _gstate(B), SamplingParams(do_cfg=True, guidance_scale=2.0,
                                                 image_top_k=16, text_top_k=16),
        force_no_cfg=jnp.asarray([False]),
    )
    assert p.shape == (B, W, V)
    np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, rtol=1e-5)


def test_sequential_window_decomposer_conditions_on_sampled_tokens():
    """SequenceSegmentDecomposer equivalent: a header SAMPLED inside the
    window (image_start + two size tokens) must constrain LATER rows of the
    same window — exactly what the parallel grammar (committed-state only)
    cannot do. Reference: logit_processor_3dim.py:457-511 (fix_logits)."""
    import jax

    from sjd_tpu.core.processors import (
        SamplingParams,
        decompose_window_sequential,
    )
    from sjd_tpu.core import grammar as G

    V = 64
    spec = GrammarSpec(
        kind="lumina", image_start_id=48, image_end_id=49, newline_id=50,
        image_vocab_start=4, image_vocab_end=47, size_token_base=52,
        grid_scale=2,
    )
    params = SamplingParams(do_cfg=False, greedy=True, image_top_k=44,
                            text_top_k=60)
    g0 = G.init_state(1)

    # rows favor: <image_start>, size(53), size(53), then a TEXT token (60)
    scores = np.full((1, 4, V), -5.0, np.float32)
    scores[0, 0, 48] = 5.0
    scores[0, 1, 53] = 5.0
    scores[0, 2, 53] = 5.0
    scores[0, 3, 60] = 5.0  # would win unconstrained
    scores[0, 3, 10] = 4.0  # best in-image-vocab candidate

    out, toks = decompose_window_sequential(
        jax.random.PRNGKey(0), jnp.asarray(scores), spec, g0, params
    )
    toks = np.asarray(toks)[0].tolist()
    assert toks[:3] == [48, 53, 53]
    # row 3 is inside the (now armed) image: text token suppressed
    assert 4 <= toks[3] <= 47 and toks[3] == 10, toks
    # fix_logits: each row collapsed to a one-hot at the sampled token
    out = np.asarray(out)
    for r, t in enumerate(toks):
        assert out[0, r, t] == 0.0
        assert (out[0, r, :t] < -1e30).all() and (out[0, r, t + 1:] < -1e30).all()

    # the engine's parallel grammar, by contrast, leaves row 3 unconstrained
    par = np.asarray(G.apply_grammar(spec, g0, jnp.asarray(scores)))
    assert par[0, 3, 60] == scores[0, 3, 60]


def test_kth_largest_bit_identical_to_sort():
    """The radix-select k-th value (the hot-path top-k: no sort, ~20x faster
    on the Emu3 184k vocab) returns the exact float the sort would, including
    -inf rows, duplicates, and per-row k."""
    import numpy as np

    from sjd_tpu.core.sampling import kth_largest, top_k_dual, top_k_static

    rs = np.random.RandomState(0)
    x = rs.randn(3, 5, 257).astype(np.float32)
    x[0, 0, :50] = -np.inf
    x[1, 2, 10] = x[1, 2, 20]
    xs = jnp.asarray(x)
    for k in (1, 2, 7, 130, 257):
        want = np.sort(x, axis=-1)[..., ::-1][..., k - 1]
        got = np.asarray(kth_largest(xs, k))
        np.testing.assert_array_equal(got, want)
    # per-row k
    k_row = jnp.asarray(rs.randint(1, 257, size=(3, 5)), jnp.int32)
    want = np.take_along_axis(
        np.sort(x, axis=-1)[..., ::-1], np.asarray(k_row)[..., None] - 1, axis=-1
    )[..., 0]
    np.testing.assert_array_equal(np.asarray(kth_largest(xs, k_row)), want)

    # threshold filters match the previous sort-based implementation bit-wise
    im = jnp.asarray([True, False, True])
    vals = jax.lax.top_k(xs, 50)[0]
    thr = jnp.where(im[:, None], vals[..., 49], vals[..., 6])
    old = jnp.where(xs < thr[..., None], float(jnp.finfo(jnp.float32).min), xs)
    np.testing.assert_array_equal(
        np.asarray(top_k_dual(xs, im, 50, 7)), np.asarray(old)
    )
    thr13 = jax.lax.top_k(xs, 13)[0][..., 12:]
    old13 = jnp.where(xs < thr13, float(jnp.finfo(jnp.float32).min), xs)
    np.testing.assert_array_equal(np.asarray(top_k_static(xs, 13)), np.asarray(old13))
