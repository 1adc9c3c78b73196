"""Statistical parity of the vectorized acceptance against the reference's
SpeculativeSampler (scheduler/jacobi_iteration_lumina_mgpt.py:134-315),
imported read-only as a test oracle on identical fixed distributions.

RNG engines differ (torch Generator vs threefry), so parity is statistical:
over many seeds, the distribution of accepted-prefix lengths and the marginal
distribution of the committed token at the rejection point must match.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

# the reference targets transformers 4.47; shim symbols removed since then
import transformers.generation.logits_process as _lp  # noqa: E402

if not hasattr(_lp, "LogitsWarper"):
    _lp.LogitsWarper = _lp.LogitsProcessor

from sjd_tpu.core.acceptance import speculative_accept
from sjd_tpu.core.sampling import sample_from_logits

W, V = 6, 24


def _dists(seed):
    rs = np.random.RandomState(seed)
    p_draft = rs.dirichlet(np.ones(V) * 0.7, size=(1, W)).astype(np.float32)
    p_new = rs.dirichlet(np.ones(V) * 0.7, size=(1, W)).astype(np.float32)
    x = rs.randint(0, V, size=(1, W)).astype(np.int64)
    y = rs.randint(0, V, size=(1, W)).astype(np.int64)
    return x, y, p_draft, p_new


def _reference_sampler(gen):
    from scheduler.jacobi_iteration_lumina_mgpt import SpeculativeSampler

    return SpeculativeSampler(
        generator=gen,
        reject_sampling_relative_ids=-torch.ones(1, dtype=torch.long),
        reject_sampling_draft_token_logits=torch.zeros((1, V)),
        sampling_last_draft_token=torch.zeros((1,), dtype=torch.long),
    )


def test_accept_length_distribution_matches_reference():
    trials = 600
    ref_lens, my_lens = [], []
    ref_last, my_last = [], []

    x, y, p_draft, p_new = _dists(7)

    # reference, many torch seeds
    for t in range(trials):
        gen = torch.Generator().manual_seed(t)
        sampler = _reference_sampler(gen)
        inds, toks, _ = sampler(
            draft_tokens=torch.tensor(x),
            advanced_tokens=torch.tensor(y),
            draft_prob=torch.tensor(p_draft),
            advanced_prob=torch.tensor(p_new),
            all_collected_input_ids=torch.tensor(x),
        )
        n = int(inds[0])
        ref_lens.append(n)
        ref_last.append(int(toks[0, n - 1]))

    # this repo, many jax seeds
    def resample(rng, logits, row):
        return sample_from_logits(rng, logits)

    jx, jy = jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32)
    jd, jn = jnp.asarray(p_draft), jnp.asarray(p_new)
    active = jnp.full((1,), W, jnp.int32)
    for t in range(trials):
        res = speculative_accept(jax.random.PRNGKey(t), jx, jy, jd, jn,
                                 active, resample)
        n = int(res.n[0])
        my_lens.append(n)
        my_last.append(int(res.out_tokens[0, n - 1]))

    # accepted-length distributions agree (total variation distance small)
    ref_hist = np.bincount(ref_lens, minlength=W + 1) / trials
    my_hist = np.bincount(my_lens, minlength=W + 1) / trials
    tv = 0.5 * np.abs(ref_hist - my_hist).sum()
    assert tv < 0.12, (tv, ref_hist, my_hist)

    # the committed token at the boundary has the same marginal
    ref_tok = np.bincount(ref_last, minlength=V) / trials
    my_tok = np.bincount(my_last, minlength=V) / trials
    tv_tok = 0.5 * np.abs(ref_tok - my_tok).sum()
    assert tv_tok < 0.15, tv_tok


def test_accepted_tokens_equal_drafts_in_both():
    """Structural agreement: in both implementations, every accepted slot
    before the boundary carries the draft token."""
    x, y, p_draft, p_new = _dists(11)
    gen = torch.Generator().manual_seed(0)
    sampler = _reference_sampler(gen)
    inds, toks, _ = sampler(
        draft_tokens=torch.tensor(x),
        advanced_tokens=torch.tensor(y),
        draft_prob=torch.tensor(p_draft),
        advanced_prob=torch.tensor(p_new),
        all_collected_input_ids=torch.tensor(x),
    )
    n_ref = int(inds[0])
    assert (toks[0, : n_ref - 1].numpy() == x[0, 1:n_ref]).all()

    def resample(rng, logits, row):
        return sample_from_logits(rng, logits)

    res = speculative_accept(
        jax.random.PRNGKey(0), jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
        jnp.asarray(p_draft), jnp.asarray(p_new), jnp.full((1,), W, jnp.int32),
        resample,
    )
    n = int(res.n[0])
    got = np.asarray(res.out_tokens[0, : n - 1])
    np.testing.assert_array_equal(got, x[0, 1:n])
