"""Vectorized speculative acceptance and the deterministic Jacobi matcher.

This replaces the reference's Python-side per-batch, per-token accept loop
(SpeculativeSampler.__call__, scheduler/jacobi_iteration_lumina_mgpt.py:247-315)
— which reads device scalars token-by-token and is a major CPU-side latency
source — with a parallel formulation that runs entirely inside the jitted
decode step:

  accept_i   = u_i < min(1, p_new(x_i) / p_draft(x_i))        for i = 1..W-1
  n          = 1 + sum(cumprod(accept))                        (first rejection)
  residual   ~ softmax(processors(log max(0, p_new - p_draft))) at the
               rejection point (reject_sampling_single_token, :203-241)

Window convention (same as the reference): window input x_0..x_{W-1} where
x_0 is the last committed token; model output y_i ~ p_new(. | x_0..x_i)
predicts position i+1. Committed tokens this step are y_0..y_{n-1}, where for
j < n-1 acceptance guarantees the committed token equals the draft x_{j+1},
and y_{n-1} is either the model's fresh sample at the last active slot (full
acceptance) or the calibrated residual resample (rejection). Unaccepted model
samples y_n.. are carried as the next window's draft seeds — the Jacobi
fixed-point update.

Unlike the reference (which synchronizes the batch to min(first_misaligned),
:362), acceptance lengths here are per-sample; divergent lengths are handled
by per-sample cache offsets in the engine.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


class AcceptResult(NamedTuple):
    n: jnp.ndarray  # [B] int32 — tokens committed this step (>= 1)
    out_tokens: jnp.ndarray  # [B, W] int32 — committed at slots [0, n)
    out_probs: jnp.ndarray  # [B, W, V] fp32 — their recorded draft dists
    carried_tokens: jnp.ndarray  # [B, W] int32 — next-window draft seeds
    carried_probs: jnp.ndarray  # [B, W, V] fp32 — their draft dists
    carried_count: jnp.ndarray  # [B] int32


def _gather_rows(t: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """t: [B, W, ...], idx: [B] -> [B, ...] (clamped)."""
    idx = jnp.clip(idx, 0, t.shape[1] - 1)
    return jnp.take_along_axis(
        t, idx.reshape(-1, *([1] * (t.ndim - 1))), axis=1
    ).squeeze(1)


def _shift_carry(y: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """carried[k] = y[n + k] (clamped); y: [B, W, ...]."""
    W = y.shape[1]
    k = jnp.arange(W, dtype=jnp.int32)[None, :]
    idx = jnp.clip(n[:, None] + k, 0, W - 1)
    return jnp.take_along_axis(
        y, idx.reshape(*idx.shape, *([1] * (y.ndim - 2))), axis=1
    )


def speculative_accept(
    rng: jax.Array,
    x: jnp.ndarray,  # [B, W] window inputs (x_0 = last committed)
    y: jnp.ndarray,  # [B, W] model samples per window position
    p_draft: jnp.ndarray,  # [B, W, V] draft dists for x
    p_new: jnp.ndarray,  # [B, W, V] processed model dists (y ~ p_new)
    active_w: jnp.ndarray,  # [B] int32 — live window width this step
    resample_fn: Callable[[jax.Array, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    # resample_fn(rng, residual_logits [B, V], reject_row [B]) -> tokens [B]
) -> AcceptResult:
    B, W, V = p_new.shape
    if getattr(rng, "ndim", 0) == 2:  # per-sample [B, 2] streams
        ks = jax.vmap(lambda k: jax.random.split(k, 2))(rng)  # [B, 2, 2]
        rng_u, rng_r = ks[:, 0], ks[:, 1]
        u = jax.vmap(
            lambda k: jax.random.uniform(k, (W - 1,), jnp.float32)
        )(rng_u)
    else:
        rng_u, rng_r = jax.random.split(rng)
        u = jax.random.uniform(rng_u, (B, W - 1), jnp.float32)

    # --- acceptance tests for window slots 1..W-1 ----------------------------
    xi = x[:, 1:]  # [B, W-1] draft tokens under test
    p_adv_at_x = jnp.take_along_axis(p_new[:, :-1, :], xi[:, :, None], axis=2)[..., 0]
    p_drf_at_x = jnp.take_along_axis(p_draft[:, 1:, :], xi[:, :, None], axis=2)[..., 0]
    ratio = p_adv_at_x / jnp.maximum(p_drf_at_x, 1e-20)
    i = jnp.arange(1, W, dtype=jnp.int32)[None, :]
    accept = (u < jnp.minimum(ratio, 1.0)) & (i < active_w[:, None])

    run = jnp.cumprod(accept.astype(jnp.int32), axis=1)
    n = 1 + jnp.sum(run, axis=1)  # [B] first rejection index, or active_w
    n = jnp.minimum(n, active_w)
    full = n >= active_w  # no rejection within the live window

    # --- residual resample at the rejection point ----------------------------
    adv_row = _gather_rows(p_new, n - 1)  # [B, V] model dist at target slot
    drf_row = _gather_rows(p_draft, jnp.minimum(n, W - 1))  # draft at slot n
    residual = jnp.maximum(adv_row - drf_row, 0.0)
    res_logits = jnp.where(residual > 0, jnp.log(jnp.maximum(residual, 1e-38)), NEG_INF)
    # guard: if p_new <= p_draft everywhere (degenerate), fall back to p_new
    degenerate = jnp.all(residual <= 0, axis=-1, keepdims=True)
    adv_logits = jnp.where(
        adv_row > 0, jnp.log(jnp.maximum(adv_row, 1e-38)), NEG_INF
    )
    res_logits = jnp.where(degenerate, adv_logits, res_logits)
    resampled = resample_fn(rng_r, res_logits, n - 1)  # [B]

    # --- assemble committed tokens/probs -------------------------------------
    j = jnp.arange(W, dtype=jnp.int32)[None, :]
    y_last = _gather_rows(y, active_w - 1)  # fresh sample on full acceptance
    last_tok = jnp.where(full, y_last, resampled)  # [B]

    x_next = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)  # x_{j+1}
    out_tokens = jnp.where(
        j < (n - 1)[:, None], x_next, jnp.where(j == (n - 1)[:, None], last_tok[:, None], 0)
    ).astype(jnp.int32)

    # committed slot j < n-1 records the accepted draft's dist p_draft[j+1]
    # (SpeculativeSampler accept branch, :288-291); the last committed slot
    # keeps the model dist p_new[n-1] in both branches (:292-311).
    p_draft_next = jnp.concatenate([p_draft[:, 1:], p_draft[:, -1:]], axis=1)
    sel = (j < (n - 1)[:, None])[:, :, None]
    sel_last = (j == (n - 1)[:, None])[:, :, None]
    out_probs = jnp.where(sel, p_draft_next, jnp.where(sel_last, p_new, 0.0))

    # --- carry the Jacobi iterates y_n..y_{active_w-1} ------------------------
    carried_tokens = _shift_carry(y, n).astype(jnp.int32)
    carried_probs = _shift_carry(p_new, n)
    carried_count = jnp.maximum(active_w - n, 0)

    return AcceptResult(
        n=n.astype(jnp.int32),
        out_tokens=out_tokens,
        out_probs=out_probs,
        carried_tokens=carried_tokens,
        carried_probs=carried_probs,
        carried_count=carried_count.astype(jnp.int32),
    )


def jacobi_accept(
    x: jnp.ndarray,  # [B, W]
    y: jnp.ndarray,  # [B, W]
    p_new: jnp.ndarray,  # [B, W, V]
    active_w: jnp.ndarray,  # [B]
) -> AcceptResult:
    """Deterministic Jacobi acceptance: longest prefix with x_i == y_{i-1}
    (find_first_misaligned_token_inds, jacobi_iteration_lumina_mgpt.py:317-333).
    Committed tokens are simply y_0..y_{n-1}; no resampling."""
    B, W, V = p_new.shape
    i = jnp.arange(1, W, dtype=jnp.int32)[None, :]
    match = (x[:, 1:] == y[:, :-1]) & (i < active_w[:, None])
    run = jnp.cumprod(match.astype(jnp.int32), axis=1)
    n = jnp.minimum(1 + jnp.sum(run, axis=1), active_w)

    j = jnp.arange(W, dtype=jnp.int32)[None, :]
    out_tokens = jnp.where(j < n[:, None], y, 0).astype(jnp.int32)
    out_probs = jnp.where((j < n[:, None])[:, :, None], p_new, 0.0)
    carried_tokens = _shift_carry(y, n).astype(jnp.int32)
    carried_probs = _shift_carry(p_new, n)
    carried_count = jnp.maximum(active_w - n, 0)
    return AcceptResult(
        n=n.astype(jnp.int32),
        out_tokens=out_tokens,
        out_probs=out_probs,
        carried_tokens=carried_tokens,
        carried_probs=carried_probs,
        carried_count=carried_count.astype(jnp.int32),
    )
