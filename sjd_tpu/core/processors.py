"""The logits pipeline: CFG mix -> grammar -> top-k/top-p -> probabilities.

Replaces the reference's LogitsProcessorList machinery
(sampling_logits2tokens, scheduler/jacobi_iteration_lumina_mgpt.py:84-132;
processor stack built in renew_pipeline, :432-468) with one pure function
over the whole [B, W, V] window.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import grammar as grammar_lib
from . import sampling


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """The de-facto jacobi_param_dict schema of the reference
    (test_lumina_mgpt.py:31-63, model_wrappers/model_loader.py:269-280)."""

    guidance_scale: float = 3.0
    do_cfg: bool = True
    image_top_k: int = 2000
    text_top_k: int = 10
    top_p: Optional[float] = None
    temperature: float = 1.0
    greedy: bool = False  # do_sample=False equivalent
    # approx_max_k threshold instead of exact lax.top_k (0.80 -> 0.34 ms per
    # step at k=2000 over 65k vocab; borderline-token support may differ from
    # the reference sampler, hence opt-in)
    approx_top_k: bool = False


def cfg_mix(
    logits: jnp.ndarray,  # [2B, W, V] — [cond; uncond] halves
    guidance_scale: float,
    force_no_cfg: jnp.ndarray,  # [B] bool — outside an image segment
) -> jnp.ndarray:
    """g * (cond - uncond) + uncond, gated per sample by force_no_cfg
    (check_is_force_no_cfg, jacobi_iteration_lumina_mgpt.py:70-80, :97-104)."""
    B = logits.shape[0] // 2
    cond, uncond = logits[:B], logits[B:]
    mixed = guidance_scale * (cond - uncond) + uncond
    return jnp.where(force_no_cfg[:, None, None], cond, mixed)


def process_window_logits(
    logits: jnp.ndarray,  # [S, W, V] fp32 (S = 2B with CFG else B)
    spec: grammar_lib.GrammarSpec,
    gstate: grammar_lib.GrammarState,
    params: SamplingParams,
    *,
    force_no_cfg: Optional[jnp.ndarray] = None,  # [B] bool
    pred_pos: Optional[jnp.ndarray] = None,  # [B, W] real predicted positions
    begin_pos: Optional[jnp.ndarray] = None,  # [B] first generated position
) -> jnp.ndarray:
    """Returns processed per-token probabilities [B, W, V] (fp32, sums to 1).

    Matches the reference order exactly: CFG mix -> grammar processor ->
    interleaved top-k (-> top-p) -> softmax
    (sampling_logits2tokens + renew_pipeline's processor list).
    """
    if params.do_cfg and params.guidance_scale != 1.0:
        B = logits.shape[0] // 2
        if force_no_cfg is None:
            force_no_cfg = jnp.zeros((B,), bool)
        scores = cfg_mix(logits, params.guidance_scale, force_no_cfg)
    elif params.do_cfg:
        # guidance_scale == 1.0 makes the mix an identity; the doubled
        # [cond; uncond] batch must still collapse to the cond half or the
        # [2B, W, V] tensor breaks every downstream B-shaped op (the engine
        # normalizes do_cfg away at construction, but this function is the
        # public pipeline surface and direct callers hit it)
        scores = logits[: logits.shape[0] // 2]
    else:
        scores = logits

    if params.temperature != 1.0:
        scores = scores / params.temperature

    scores = grammar_lib.apply_grammar(
        spec, gstate, scores, pred_pos=pred_pos, begin_pos=begin_pos
    )

    image_mode = gstate.in_image
    scores = sampling.top_k_dual(
        scores, image_mode, params.image_top_k, params.text_top_k,
        approx=params.approx_top_k,
    )
    if params.top_p is not None and params.top_p < 1.0:
        scores = sampling.top_p(scores, params.top_p)

    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1)


def decompose_window_sequential(
    rng: jax.Array,
    scores: jnp.ndarray,  # [B, W, V] fp32 window logits
    spec: grammar_lib.GrammarSpec,
    gstate: grammar_lib.GrammarState,
    params: SamplingParams,
    *,
    fix_logits: bool = True,
):
    """Sequential window decomposition — the reference's
    SequenceSegmentDecomposer (scheduler/logit_processor_3dim.py:457-511):
    each window row is processed with the grammar state advanced by the
    tokens SAMPLED at earlier rows (not the drafts), so an <image_start> or
    size token sampled mid-window constrains later rows in the same step.
    With fix_logits the row's scores collapse to a one-hot at the sampled
    token (the reference's scatter of 0 over -inf).

    The reference never enables this path (its call site is commented out,
    jacobi_iteration_emu3.py:403-410); it is provided for API completeness
    as a lax.scan over window rows and is NOT used by the engine's default
    parallel pipeline. Returns (processed scores/probs [B, W, V],
    sampled tokens [B, W])."""
    B, W, V = scores.shape

    def step(carry, row_scores):  # row_scores: [B, V]
        g, r = carry
        if params.temperature != 1.0:
            row_scores = row_scores / params.temperature
        s = grammar_lib.apply_grammar_single(
            spec, g, row_scores, jnp.zeros((B,), jnp.int32)
        )
        s = sampling.top_k_dual(
            s[:, None, :], g.in_image, params.image_top_k, params.text_top_k,
            approx=params.approx_top_k,
        )[:, 0, :]
        if params.top_p is not None and params.top_p < 1.0:
            s = sampling.top_p(s, params.top_p)
        r, r_tok = jax.random.split(r)
        if params.greedy:
            tok = jnp.argmax(s, axis=-1).astype(jnp.int32)
        else:
            tok = sampling.sample_from_logits(r_tok, s)
        out = (
            jnp.where(
                jax.nn.one_hot(tok, V, dtype=bool), 0.0, grammar_lib.NEG_INF
            )
            if fix_logits
            else s
        )
        g = grammar_lib.update_state(
            spec, g, tok[:, None], jnp.ones((B,), jnp.int32)
        )
        return (g, r), (out, tok)

    (_, _), (outs, toks) = jax.lax.scan(
        step, (gstate, rng), scores.transpose(1, 0, 2)
    )
    return outs.transpose(1, 0, 2), toks.T


def process_residual_logits(
    residual_logits: jnp.ndarray,  # [B, V] — log(max(0, p_new - p_draft))
    spec: grammar_lib.GrammarSpec,
    gstate: grammar_lib.GrammarState,
    params: SamplingParams,
    offset_in_window: jnp.ndarray,  # [B] — window row of the rejected token
    *,
    pred_pos: Optional[jnp.ndarray] = None,  # [B] real position of that row
    begin_pos: Optional[jnp.ndarray] = None,  # [B]
) -> jnp.ndarray:
    """Re-constrain the rejection-resampling residual, as
    reject_sampling_single_token does (jacobi_iteration_lumina_mgpt.py:215-241):
    grammar + top-k run again on the residual logits, then softmax."""
    scores = grammar_lib.apply_grammar_single(
        spec, gstate, residual_logits, offset_in_window,
        pred_pos=pred_pos, begin_pos=begin_pos,
    )
    scores = sampling.top_k_dual(
        scores[:, None, :], gstate.in_image, params.image_top_k,
        params.text_top_k, approx=params.approx_top_k,
    )[:, 0, :]
    if params.top_p is not None and params.top_p < 1.0:
        scores = sampling.top_p(scores, params.top_p)
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
