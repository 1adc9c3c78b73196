"""Window-vectorized sampling primitives.

Replaces the reference's per-position `torch.multinomial` calls
(sampling_logits2tokens, scheduler/jacobi_iteration_lumina_mgpt.py:84-132)
with fp32 Gumbel-max sampling over the whole [B, W, V] window in one shot,
and the stateful top-k/top-p warpers (logit_processor_3dim.py:158-419) with
pure functions. RNG is threefry (`jax.random`) folded per decode step so a
fixed seed gives a fixed generation, mirroring the reference's seeded
`torch.Generator` (jacobi_iteration_lumina_mgpt.py:1021-1023).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def sample_from_logits(rng: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
    """Categorical sample over the last axis via Gumbel-max, fp32."""
    g = jax.random.gumbel(rng, logits.shape, jnp.float32)
    safe = jnp.maximum(logits.astype(jnp.float32), NEG_INF)
    return jnp.argmax(safe + g, axis=-1).astype(jnp.int32)


def sample_from_probs(rng: jax.Array, probs: jnp.ndarray) -> jnp.ndarray:
    """Categorical sample from (possibly unnormalized) probabilities."""
    logp = jnp.log(jnp.maximum(probs.astype(jnp.float32), 1e-38))
    logp = jnp.where(probs > 0, logp, NEG_INF)
    return sample_from_logits(rng, logp)


def top_k_dual(
    scores: jnp.ndarray,  # [B, W, V] fp32
    image_mode: jnp.ndarray,  # [B] bool — inside an image segment
    image_top_k: int,
    text_top_k: int,
    approx: bool = False,
) -> jnp.ndarray:
    """Interleaved top-k: image_top_k inside an image else text_top_k,
    decided per sample from committed tokens exactly like
    MultiTokensInterleavedTopKLogitsWarper (logit_processor_3dim.py:158-204).

    One static top-k at max(image_top_k, text_top_k) provides both
    thresholds; the per-sample threshold is selected with a `where`.
    ``approx`` swaps lax.top_k for the TPU-optimized approx_max_k (measured
    0.80 -> 0.34 ms at k=2000 over a 65k vocab; the k-th-value threshold may
    occasionally admit/drop a borderline token, so the exact reference
    sampler semantics stay the default).
    """
    V = scores.shape[-1]
    k_img = min(image_top_k, V)
    k_txt = min(text_top_k, V)
    k_max = max(k_img, k_txt)
    if approx:
        vals = jax.lax.approx_max_k(
            scores, k_max, recall_target=0.95, aggregate_to_topk=True
        )[0]
    else:
        vals = jax.lax.top_k(scores, k_max)[0]  # [B, W, k_max] descending
    thr_img = vals[..., k_img - 1]
    thr_txt = vals[..., k_txt - 1]
    thr = jnp.where(image_mode[:, None], thr_img, thr_txt)  # [B, W]
    return jnp.where(scores < thr[..., None], NEG_INF, scores)


def top_k_static(scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """Plain top-k filter over the last axis."""
    V = scores.shape[-1]
    k = min(k, V)
    thr = jax.lax.top_k(scores, k)[0][..., k - 1 :]
    return jnp.where(scores < thr, NEG_INF, scores)


def top_p(scores: jnp.ndarray, p: float, min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """Nucleus filter over the last axis, matching TopPLogitsWarper3d
    (logit_processor_3dim.py:355-419): tokens in the ascending-sorted tail
    whose cumulative probability stays <= 1 - p are removed."""
    sorted_scores = jnp.sort(scores, axis=-1)  # ascending
    cum = jnp.cumsum(jax.nn.softmax(sorted_scores, axis=-1), axis=-1)
    remove_sorted = cum <= (1.0 - p)
    if min_tokens_to_keep > 0:
        keep = jnp.zeros_like(remove_sorted)
        keep = keep.at[..., -min_tokens_to_keep:].set(True)
        remove_sorted = remove_sorted & ~keep
    # threshold = smallest kept score
    V = scores.shape[-1]
    n_removed = jnp.sum(remove_sorted, axis=-1, keepdims=True)
    thr = jnp.take_along_axis(sorted_scores, jnp.minimum(n_removed, V - 1), axis=-1)
    return jnp.where(scores < thr, NEG_INF, scores)


def onehot_probs(tokens: jnp.ndarray, vocab_size: int) -> jnp.ndarray:
    """One-hot 'distribution' for randomly initialized draft tokens — the
    reference assigns fresh drafts probability 1 at their own id
    (get_multi_token_for_preparation, jacobi_iteration_lumina_mgpt.py:502-514),
    which makes the acceptance ratio p_new/p_draft = p_new for them."""
    return jax.nn.one_hot(tokens, vocab_size, dtype=jnp.float32)
