"""Sequential window decomposer — the reference's SequenceSegmentDecomposer
(scheduler/logit_processor_3dim.py:457-511), ported for strict completeness
(round-5 verdict #9; the reference's own main path leaves it commented out at
jacobi_iteration_emu3.py:403-410).

Semantics being reproduced: given a window's [B, W, V] scores, walk the rows
LEFT TO RIGHT; at each row re-run the (stateful) logits processors
conditioned on the committed ids PLUS the tokens sampled so far *within this
window* (`input_ids_cum`), sample a token (multinomial or argmax), append it
to the conditioning, and — with fix_logits=True — replace the row's scores
with "0 at the sampled token, -inf elsewhere" so downstream consumers treat
the token as fixed.

TPU-native design: the per-row "re-run processors on input_ids_cum" is a
GrammarState advance (grammar.update_state over the one token just sampled)
— the grammar is this repo's pure-function equivalent of the reference's
stateful processor stack — so the whole walk is one lax.scan over the window
width with a tiny carried state, not W re-scans of the sequence. Top-k /
top-p / temperature run inside each row exactly as the sub-processor list
would.

Unlike the window path (which conditions every row on the WINDOW-START
state, matching the reference's main jacobi iteration), rows here see exact
per-token grammar conditioning: a row boundary crossed mid-window forces
<eol> from the in-window position, not the stale one. The parity test pins
this to a per-token loop of apply_grammar_single + update_state.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import grammar as grammar_lib
from . import sampling as sampling_lib
from .processors import SamplingParams, cfg_mix
from .sampling import onehot_probs


class DecomposeResult(NamedTuple):
    tokens: jnp.ndarray  # [B, W] int32 — sequentially sampled window tokens
    fixed_scores: jnp.ndarray  # [B, W, V] one-hot probs (fix_logits=True)
    gstate: grammar_lib.GrammarState  # state advanced over the whole window


def _process_row(
    scores: jnp.ndarray,  # [B, V]
    spec: grammar_lib.GrammarSpec,
    gstate: grammar_lib.GrammarState,
    params: SamplingParams,
    pred_pos: Optional[jnp.ndarray],
    begin_pos: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """One row through the sub-processor list: temperature -> grammar ->
    interleaved top-k (-> top-p) -> softmax. CFG is handled by the caller
    (the decomposer receives already-mixed scores, as the reference's
    decomposer sits after the CFG processor in the stack)."""
    if params.temperature != 1.0:
        scores = scores / params.temperature
    scores = grammar_lib.apply_grammar(
        spec, gstate, scores[:, None, :],
        pred_pos=None if pred_pos is None else pred_pos[:, None],
        begin_pos=begin_pos,
    )[:, 0, :]
    image_mode = gstate.in_image
    scores = sampling_lib.top_k_dual(
        scores[:, None, :], image_mode, params.image_top_k, params.text_top_k
    )[:, 0, :]
    if params.top_p is not None:
        scores = sampling_lib.top_p(scores[:, None, :], params.top_p)[:, 0, :]
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1)


def sequential_decompose(
    rng: jax.Array,
    logits: jnp.ndarray,  # [S, W, V] raw window logits (S = 2B with CFG)
    spec: grammar_lib.GrammarSpec,
    gstate: grammar_lib.GrammarState,
    params: SamplingParams,
    *,
    greedy: bool = False,
    force_no_cfg: Optional[jnp.ndarray] = None,
    pred_pos: Optional[jnp.ndarray] = None,  # [B, W]
    begin_pos: Optional[jnp.ndarray] = None,  # [B]
) -> DecomposeResult:
    """The full decomposer: CFG mix once (it is position-independent), then
    scan the window rows with exact in-window grammar conditioning."""
    if params.do_cfg and params.guidance_scale != 1.0:
        B = logits.shape[0] // 2
        if force_no_cfg is None:
            force_no_cfg = jnp.zeros((B,), bool)
        scores = cfg_mix(logits, params.guidance_scale, force_no_cfg)
    elif params.do_cfg:
        scores = logits[: logits.shape[0] // 2]
    else:
        scores = logits
    B, W, V = scores.shape

    keys = jax.random.split(rng, W)

    def row(carry, inp):
        gs = carry
        sc, key, i = inp
        pp = None if pred_pos is None else pred_pos[:, i]
        probs = _process_row(sc, spec, gs, params, pp, begin_pos)
        if greedy:
            tok = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        else:
            tok = sampling_lib.sample_from_probs(key, probs[:, None, :])[:, 0]
        # commit the sample into the conditioning (input_ids_cum append)
        gs = grammar_lib.update_state(
            spec, gs, tok[:, None], jnp.ones((B,), jnp.int32)
        )
        return gs, tok

    idx = jnp.arange(W, dtype=jnp.int32)
    gs_final, toks = jax.lax.scan(
        row, gstate, (scores.transpose(1, 0, 2), keys, idx)
    )
    tokens = toks.T  # [B, W]
    return DecomposeResult(
        tokens=tokens,
        fixed_scores=onehot_probs(tokens, V),
        gstate=gs_final,
    )
