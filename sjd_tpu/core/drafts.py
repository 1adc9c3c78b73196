"""Draft-window construction: carried Jacobi iterates + fresh seeds.

Mirrors prepare_inputs_for_generation_jacobi + get_multi_token_for_preparation
(scheduler/jacobi_iteration_lumina_mgpt.py:606-740, :470-596) and the draft
score gathering of gather_from_split_tensors (logit_processor_3dim.py:513-538),
but with a static window width and no host-side tensor concatenation.

Window layout (width W):
  slot 0        — the last committed token (its KV is not yet cached)
  slots 1..W-1  — draft tokens: first the carried unaccepted model samples
                  from the previous step, then fresh seeds.

Fresh-seed schemes (multi_token_init_scheme):
  'random'          — uniform over the image-token vocab; draft dist is the
                      one-hot at the drawn id (reference :502-514).
  'repeat_horizon'  — spatial extrapolation: a seed at grid column >= 1 copies
                      the token at the previous flattened grid index, clamped
                      to the last available (committed or carried) token
                      (reference :531-594). Column-0 (end-of-line) slots stay
                      random.
  'sample_horizon'  — same indexing, but the seed is the argmax of the
                      recorded distribution at the source position. The
                      reference's "multinomial" here is top-1-restricted
                      (:484-500): topk(k=1) keeps one logit, everything else
                      is -inf, softmax puts probability 1.0 on it, and the
                      multinomial draw is deterministic — argmax is bit-exact
                      parity, not an approximation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import grammar as grammar_lib
from .sampling import onehot_probs


class Window(NamedTuple):
    x: jnp.ndarray  # [B, W] int32 window inputs
    p_draft: jnp.ndarray  # [B, W, V] fp32 draft distributions


def build_window(
    rng: jax.Array,
    *,
    scheme: str,
    spec: grammar_lib.GrammarSpec,
    gstate: grammar_lib.GrammarState,
    tokens: jnp.ndarray,  # [B, L_max] committed buffer
    length: jnp.ndarray,  # [B] committed count (incl. padded prompt)
    last_prob: jnp.ndarray,  # [B, V] dist recorded for the last committed token
    carried_tokens: jnp.ndarray,  # [B, W]
    carried_probs: jnp.ndarray,  # [B, W, V]
    carried_count: jnp.ndarray,  # [B]
    window: int,
    vocab_size: int,
    grammar_seed: bool = True,
) -> Window:
    B = tokens.shape[0]
    W = window
    V = vocab_size

    last_tok = jnp.take_along_axis(tokens, (length - 1)[:, None], axis=1)  # [B,1]

    if W == 1:
        return Window(x=last_tok.astype(jnp.int32), p_draft=last_prob[:, None, :])

    # ---- fresh random seeds for all draft slots -----------------------------
    d = jnp.arange(W - 1, dtype=jnp.int32)[None, :]  # draft index per slot
    lo, hi = spec.image_vocab_start, spec.image_vocab_end
    if hi < lo:  # no image vocab declared: fall back to the full vocab
        lo, hi = 0, V - 1
    if getattr(rng, "ndim", 0) == 2:  # per-sample [B, 2] streams
        rand = jax.vmap(
            lambda k: jax.random.randint(k, (W - 1,), lo, hi + 1, jnp.int32)
        )(rng)
    else:
        rand = jax.random.randint(rng, (B, W - 1), lo, hi + 1, jnp.int32)

    # ---- spatial-extrapolation override -------------------------------------
    if scheme in ("repeat_horizon", "sample_horizon"):
        cc = carried_count[:, None]
        # seed source: concat index (length + d - 1) clamped to the last
        # available token — carried[d-1] when in range, else the most recent
        # carried/committed token (reference clamp at :559-566).
        src = jnp.clip(d - 1, 0, jnp.maximum(cc - 1, 0))
        from_carried = jnp.take_along_axis(carried_tokens, src, axis=1)
        have_carried = (cc > 0) & (d >= 1)
        seed_tok = jnp.where(have_carried, from_carried, last_tok)
        if scheme == "sample_horizon":
            src_probs = jnp.take_along_axis(
                carried_probs, src[:, :, None], axis=1
            )  # [B, W-1, V]
            carried_seed = jnp.argmax(src_probs, axis=-1).astype(jnp.int32)
            # clamp-to-last fallback: the seed is the argmax of the RECORDED
            # distribution (the reference's top-1-restricted multinomial over
            # the stored score row), not the token that was sampled from it —
            # they differ whenever non-greedy sampling picked a non-mode token
            last_seed = jnp.argmax(last_prob, axis=-1).astype(jnp.int32)[:, None]
            seed_tok = jnp.where(
                have_carried, carried_seed,
                jnp.broadcast_to(last_seed, carried_seed.shape),
            )
        # draft slot d sits at image offset o = img_count + d; its grid column
        # (1-based, 0 = end-of-line) is (o + 1) % (w + 1); only column >= 1
        # slots are extrapolated (reference valid_indices, :549-553).
        o = gstate.img_count[:, None] + d
        w1 = jnp.maximum(gstate.w_lat[:, None] + 1, 1)
        col = (o + 1) % w1
        use_seed = (
            (gstate.in_image & gstate.size_known)[:, None]
            & (col >= 1)
            & (seed_tok >= lo)
            & (seed_tok <= hi)
        )
        rand = jnp.where(use_seed, seed_tok, rand)

    rand_probs = onehot_probs(rand, V)  # [B, W-1, V]

    # ---- merge carried drafts ahead of fresh seeds --------------------------
    in_carry = d < carried_count[:, None]
    slot_tok = jnp.where(
        in_carry,
        jnp.take_along_axis(carried_tokens, jnp.minimum(d, W - 1), axis=1),
        rand,
    )
    slot_probs = jnp.where(
        in_carry[:, :, None],
        carried_probs[:, : W - 1, :],
        rand_probs,
    )

    # ---- grammar-aware seeding ----------------------------------------------
    # Fresh slots at grammar-FORCED offsets (<eol> at row ends, <eof>/<eoi>/
    # <eos>/<pad> past the grid) get the forced token with a one-hot draft
    # dist: p_new there is one-hot at the same token, so the acceptance ratio
    # is exactly 1 — a certain accept where a random seed was a certain
    # reject. Carried slots are untouched: their tokens were sampled from the
    # (already forced) model dist last step, so they carry the forced token
    # with a one-hot recorded dist anyway. See grammar.forced_token_at.
    if grammar_seed and spec.kind != "none":
        o_all = gstate.img_count[:, None] + d  # draft slot d -> image offset
        forced_m, forced_id = grammar_lib.forced_token_at(spec, gstate, o_all)
        override = forced_m & ~in_carry
        slot_tok = jnp.where(override, forced_id, slot_tok)
        slot_probs = jnp.where(
            override[:, :, None], onehot_probs(forced_id, V), slot_probs
        )

    x = jnp.concatenate([last_tok, slot_tok], axis=1).astype(jnp.int32)
    p_draft = jnp.concatenate([last_prob[:, None, :], slot_probs], axis=1)
    return Window(x=x, p_draft=p_draft)
