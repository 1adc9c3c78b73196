"""Unit tests for vectorized speculative acceptance — the properties implied
by the reference's SpeculativeSampler (jacobi_iteration_lumina_mgpt.py:247-315)."""

import jax
import jax.numpy as jnp
import numpy as np

from sjd_tpu.core.acceptance import jacobi_accept, speculative_accept

V = 16
W = 6
B = 2


def _passthrough_resample(rng, logits, row):
    # sample from the residual without extra processing
    from sjd_tpu.core.sampling import sample_from_logits

    return sample_from_logits(rng, logits)


def _rand_dist(key, shape):
    return jax.nn.softmax(jax.random.normal(key, shape), axis=-1)


def test_identical_dists_accept_everything():
    """draft == target distribution => ratio 1 => every draft accepted."""
    key = jax.random.PRNGKey(0)
    kx, kp = jax.random.split(key)
    p = _rand_dist(kp, (B, W, V))
    x = jax.random.randint(kx, (B, W), 0, V)
    # draft dist at slot i must equal the model dist *predicting* slot i,
    # i.e. p_draft[i] == p_new[i-1]
    p_draft = jnp.concatenate([p[:, :1], p[:, :-1]], axis=1)
    y = jax.random.randint(kx, (B, W), 0, V)
    active = jnp.full((B,), W, jnp.int32)
    res = speculative_accept(
        jax.random.PRNGKey(1), x, y, p_draft, p, active, _passthrough_resample
    )
    np.testing.assert_array_equal(np.asarray(res.n), [W, W])
    np.testing.assert_array_equal(np.asarray(res.carried_count), [0, 0])
    # accepted slots carry the draft tokens; the final slot is the fresh sample
    np.testing.assert_array_equal(
        np.asarray(res.out_tokens[:, : W - 1]), np.asarray(x[:, 1:])
    )
    np.testing.assert_array_equal(np.asarray(res.out_tokens[:, W - 1]), np.asarray(y[:, W - 1]))


def test_onehot_mismatch_rejects_at_first_position():
    """One-hot draft dists with zero target mass => rejected immediately,
    exactly one token committed (the residual resample)."""
    x = jnp.zeros((B, W), jnp.int32)  # drafts all token 0
    y = jnp.full((B, W), 1, jnp.int32)
    p_draft = jax.nn.one_hot(x, V)  # one-hot at 0
    # target puts ~all mass on token 1 -> ratio p_new(0)/1 ~ 0
    p_new = jnp.full((B, W, V), 1e-9)
    p_new = p_new.at[:, :, 1].set(1.0 - (V - 1) * 1e-9)
    active = jnp.full((B,), W, jnp.int32)
    res = speculative_accept(
        jax.random.PRNGKey(0), x, y, p_draft, p_new, active, _passthrough_resample
    )
    np.testing.assert_array_equal(np.asarray(res.n), [1, 1])
    # residual = max(0, p_new - p_draft) peaks at 1 -> resampled token 1
    np.testing.assert_array_equal(np.asarray(res.out_tokens[:, 0]), [1, 1])
    np.testing.assert_array_equal(np.asarray(res.carried_count), [W - 1, W - 1])
    # carried seeds are the model samples y_1.. (the Jacobi update)
    np.testing.assert_array_equal(
        np.asarray(res.carried_tokens[:, : W - 1]), np.asarray(y[:, 1:])
    )


def test_active_window_one_is_ar_step():
    key = jax.random.PRNGKey(3)
    p_new = _rand_dist(key, (B, W, V))
    x = jnp.zeros((B, W), jnp.int32)
    y = jnp.argmax(p_new, axis=-1).astype(jnp.int32)
    res = speculative_accept(
        jax.random.PRNGKey(1), x, y, jax.nn.one_hot(x, V), p_new,
        jnp.ones((B,), jnp.int32), _passthrough_resample,
    )
    np.testing.assert_array_equal(np.asarray(res.n), [1, 1])
    np.testing.assert_array_equal(np.asarray(res.out_tokens[:, 0]), np.asarray(y[:, 0]))
    np.testing.assert_array_equal(np.asarray(res.carried_count), [0, 0])


def test_acceptance_rate_statistics():
    """Acceptance probability of a draft with ratio r must be ~min(1, r):
    check the unbiasedness of the vectorized test on a 2-token vocab."""
    trials = 2000
    # p_draft(x)=0.8, p_new(x)=0.4 => accept prob 0.5 at slot 1
    x = jnp.ones((trials, 2), jnp.int32)
    y = jnp.zeros((trials, 2), jnp.int32)
    p_draft = jnp.tile(jnp.asarray([[0.2, 0.8]], jnp.float32)[None], (trials, 2, 1))
    p_new = jnp.tile(jnp.asarray([[0.6, 0.4]], jnp.float32)[None], (trials, 2, 1))
    res = speculative_accept(
        jax.random.PRNGKey(0), x, y, p_draft, p_new,
        jnp.full((trials,), 2, jnp.int32), _passthrough_resample,
    )
    rate = float(jnp.mean((res.n == 2).astype(jnp.float32)))
    assert abs(rate - 0.5) < 0.05, rate


def test_speculative_distribution_is_unbiased():
    """The committed token at the test slot must be distributed ~ p_new,
    regardless of the draft distribution (the core speculative-sampling
    guarantee the reference inherits from Leviathan et al.)."""
    trials = 4000
    vocab = 4
    p_draft_row = jnp.asarray([0.46, 0.04, 0.25, 0.25], jnp.float32)
    p_new_row = jnp.asarray([0.1, 0.4, 0.3, 0.2], jnp.float32)

    key = jax.random.PRNGKey(7)
    kx, kacc = jax.random.split(key)
    # drafts sampled from p_draft
    xs = jax.random.categorical(kx, jnp.log(p_draft_row), shape=(trials,))
    x = jnp.stack([jnp.zeros((trials,), jnp.int32), xs.astype(jnp.int32)], axis=1)
    y = jnp.zeros((trials, 2), jnp.int32)
    p_draft = jnp.tile(p_draft_row[None, None, :], (trials, 2, 1))
    p_new = jnp.tile(p_new_row[None, None, :], (trials, 2, 1))

    res = speculative_accept(
        kacc, x, y, p_draft, p_new, jnp.full((trials,), 2, jnp.int32),
        _passthrough_resample,
    )
    # committed token at slot 0 = accepted draft or residual resample
    tok = np.asarray(res.out_tokens[:, 0])
    counts = np.bincount(tok, minlength=vocab) / trials
    np.testing.assert_allclose(counts, np.asarray(p_new_row), atol=0.035)


def test_jacobi_accept_matches_prefix():
    x = jnp.asarray([[0, 5, 6, 7, 8, 9]], jnp.int32)
    y = jnp.asarray([[5, 6, 3, 1, 2, 4]], jnp.int32)  # matches at i=1,2 only
    p = jnp.full((1, 6, V), 1.0 / V)
    res = jacobi_accept(x, y, p, jnp.asarray([6], jnp.int32))
    # x_1==y_0 (5), x_2==y_1 (6), x_3=7 != y_2=3 -> n = 3
    np.testing.assert_array_equal(np.asarray(res.n), [3])
    np.testing.assert_array_equal(np.asarray(res.out_tokens[0, :3]), [5, 6, 3])
    np.testing.assert_array_equal(np.asarray(res.carried_count), [3])
    np.testing.assert_array_equal(np.asarray(res.carried_tokens[0, :3]), [1, 2, 4])
