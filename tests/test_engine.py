"""Engine correctness tests — the unit-level validation the reference lacks
(SURVEY.md §4): greedy Jacobi must bit-match AR decoding; speculative
acceptance with draft == target must accept everything; generation must be
deterministic under a fixed seed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sjd_tpu.core import EngineConfig, SamplingParams, SJDEngine
from sjd_tpu.models import decoder_model_fns

from helpers import TINY, ar_reference_decode, make_engine, tiny_params


@pytest.fixture(scope="module")
def params():
    return tiny_params()


def test_greedy_jacobi_bitmatches_ar(params):
    """Deterministic Jacobi fixed-point iteration converges to exactly the
    AR greedy trajectory (the fixed point of x_{i+1} = argmax p(.|x_<=i))."""
    max_len = 40
    prompt = jnp.asarray([[1, 2, 3, 4, 5]], jnp.int32)
    eng = make_engine(
        window=6,
        scheme="jacobi",
        max_len=max_len,
        sampling=SamplingParams(do_cfg=False, greedy=True, image_top_k=64, text_top_k=64),
    )
    res = eng.generate(params, jax.random.PRNGKey(0), prompt)
    # a multi-token final step may overshoot max_len; compare the max_len prefix
    got = np.asarray(res.tokens[0, :max_len])

    want = ar_reference_decode(params, TINY, [1, 2, 3, 4, 5], max_len)
    np.testing.assert_array_equal(got, np.asarray(want, np.int32))


def test_greedy_speculative_bitmatches_ar(params):
    """With greedy sampling the speculative path must also reproduce AR:
    acceptance of a draft implies it equals the argmax."""
    max_len = 40
    prompt = jnp.asarray([[7, 8, 9]], jnp.int32)
    eng = make_engine(
        window=6,
        scheme="speculative_jacobi",
        max_len=max_len,
        sampling=SamplingParams(do_cfg=False, greedy=True, image_top_k=64, text_top_k=64),
    )
    res = eng.generate(params, jax.random.PRNGKey(1), prompt)
    got = np.asarray(res.tokens[0, :max_len])
    want = ar_reference_decode(params, TINY, [7, 8, 9], max_len)
    np.testing.assert_array_equal(got, np.asarray(want, np.int32))


def test_nfe_less_than_ar_steps(params):
    """Multi-token decoding must take fewer forwards than tokens generated
    (greedy drafts converge fast); this is SJD's whole point."""
    max_len = 48
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    eng = make_engine(
        window=8,
        scheme="jacobi",
        max_len=max_len,
        sampling=SamplingParams(do_cfg=False, greedy=True, image_top_k=64, text_top_k=64),
    )
    res = eng.generate(params, jax.random.PRNGKey(0), prompt)
    generated = int(res.gen_count[0])
    assert generated == max_len  # max_len budgets GENERATED tokens
    assert int(res.nfe) < generated, (int(res.nfe), generated)


def test_seeded_determinism(params):
    prompt = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    eng = make_engine(window=5, max_len=32)
    r1 = eng.generate(params, jax.random.PRNGKey(42), prompt)
    r2 = eng.generate(params, jax.random.PRNGKey(42), prompt)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))
    assert int(r1.nfe) == int(r2.nfe)
    r3 = eng.generate(params, jax.random.PRNGKey(43), prompt)
    assert not np.array_equal(np.asarray(r1.tokens), np.asarray(r3.tokens))


def test_window_one_is_plain_ar(params):
    """window=1 degenerates to ordinary AR decoding: NFE == tokens."""
    prompt = jnp.asarray([[1, 2]], jnp.int32)
    eng = make_engine(window=1, max_len=20,
                      sampling=SamplingParams(do_cfg=False, greedy=True,
                                              image_top_k=64, text_top_k=64))
    res = eng.generate(params, jax.random.PRNGKey(0), prompt)
    assert int(res.nfe) == int(res.gen_count[0])
    # max_len budgets GENERATED tokens; AR ground truth runs to prompt + 20
    want = ar_reference_decode(params, TINY, [1, 2], 22)
    got = np.asarray(res.tokens[0, : int(res.length[0])])
    np.testing.assert_array_equal(got, np.asarray(want, np.int32))


def test_eos_stops_generation(params):
    """Committing the EOS id freezes the sample."""
    # pick whatever greedy AR generates at step 3 as the "eos" and check stop
    want = ar_reference_decode(params, TINY, [1, 2, 3], 24)
    eos = want[8]
    eng = make_engine(
        window=4,
        scheme="jacobi",
        max_len=64,
        eos_id=eos,
        sampling=SamplingParams(do_cfg=False, greedy=True, image_top_k=64, text_top_k=64),
    )
    res = eng.generate(params, jax.random.PRNGKey(0), jnp.asarray([[1, 2, 3]], jnp.int32))
    got = np.asarray(res.tokens[0, : int(res.length[0])])
    eos_positions = np.nonzero(got == eos)[0]
    assert len(eos_positions) >= 1
    # nothing (except possibly in-flight commits from the same step) follows
    first = int(eos_positions[0])
    assert int(res.length[0]) - first <= eng.config.window


def test_batch_divergent_lengths(params):
    """Different samples accept different counts; per-sample lengths advance
    independently (the reference could not do this — SURVEY.md §7)."""
    prompt = jnp.asarray([[1, 2, 3], [9, 8, 7]], jnp.int32)
    eng = make_engine(window=5, max_len=32)
    res = eng.generate(params, jax.random.PRNGKey(0), prompt)
    assert res.tokens.shape[0] == 2
    # a multi-token step may overshoot max_len by < window (the reference
    # commits a whole accepted prefix before checking stopping criteria)
    for b in range(2):
        assert 32 - 3 <= int(res.gen_count[b]) < 32 - 3 + 5
    # both trajectories valid: every sampled id within vocab
    toks = np.asarray(res.tokens)
    assert toks.max() < TINY.vocab_size and toks.min() >= 0


def test_batch_matches_single(params):
    """Greedy batched decode equals each sample decoded alone (cache and
    divergent acceptance bookkeeping don't leak across samples)."""
    p1 = [1, 2, 3]
    p2 = [5, 6, 7]
    eng = make_engine(
        window=4, scheme="jacobi", max_len=24,
        sampling=SamplingParams(do_cfg=False, greedy=True, image_top_k=64, text_top_k=64),
    )
    both = eng.generate(params, jax.random.PRNGKey(0),
                        jnp.asarray([p1, p2], jnp.int32))
    solo1 = eng.generate(params, jax.random.PRNGKey(0), jnp.asarray([p1], jnp.int32))
    solo2 = eng.generate(params, jax.random.PRNGKey(0), jnp.asarray([p2], jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(both.tokens[0, : int(both.length[0])]),
        np.asarray(solo1.tokens[0, : int(solo1.length[0])]),
    )
    np.testing.assert_array_equal(
        np.asarray(both.tokens[1, : int(both.length[1])]),
        np.asarray(solo2.tokens[0, : int(solo2.length[0])]),
    )


def test_accept_histogram_accounts_for_all_commits():
    """The on-device acceptance-length histogram sums to the committed
    token count (minus the prefill token) and to the decode-step count."""
    import numpy as np

    from helpers import make_engine, tiny_params

    eng = make_engine(window=5, max_len=40)
    params = tiny_params()
    res = eng.generate(params, jax.random.PRNGKey(3),
                       jnp.asarray([[1, 2, 3]], jnp.int32))
    hist = np.asarray(res.accept_hist)
    assert hist.shape == (6,)
    # every decode step of the single live sample lands in one bin
    assert hist.sum() == int(res.nfe) - 1  # prefill commits outside _step
    committed = int((hist * np.arange(6)).sum())
    assert committed == int(res.gen_count[0]) - 1, (committed, res.gen_count)
