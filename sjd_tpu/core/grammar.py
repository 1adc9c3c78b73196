"""Image-grammar logits constraints as pure functions of absolute position.

The reference implements the image grammar (suppress non-image tokens inside
an image; force end-of-line every `w+1` positions; force end-of-image at the
grid end) as stateful LogitsProcessors that re-scan the generated ids every
step (scheduler/logit_processor_3dim.py:25-155 for Lumina;
emu3/mllm/utils_emu3.py:19-62 + scheduler/jacobi_iteration_emu3.py:41-151 for
Emu3; scheduler/logit_processor_3dim.py:207-353 for Anole).

TPU-native design: the grammar is a *pure function* of
  (token offset within the image span, latent grid h, latent grid w)
so a draft window's [B, W, V] score tensor is constrained with a handful of
broadcasted comparisons — no scanning, no data-dependent shapes. A tiny
per-sample ``GrammarState`` (is an image open? where did it start? grid dims?)
is threaded through the jitted decode loop and updated from committed tokens
only.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


@dataclasses.dataclass(frozen=True)
class GrammarSpec:
    """Static grammar description for one model family.

    kind:
      "lumina" — Chameleon/Lumina-mGPT FlexAR layout
        <image_start> <h_tok> <w_tok> (w tokens <eol>) x h <image_end>
        with h_lat = (h_tok - size_token_base) * grid_scale, ditto w
        (reference logit_processor_3dim.py:107-111, item_processor.py:109-145).
        Grid dims become known only after the model emits the two size tokens.
      "emu3" — grid dims known up front from the prompt ("{H}*{W}"), image
        starts right after the prompt; layout per row `w tokens <eol>`, then
        <eof> <image_end> <eos>, then pad (emu3/mllm/utils_emu3.py:19-62).
      "anole" — HF Chameleon: fixed 1024-token image after <boi>, force <eoi>
        at offset 1025 (scheduler/jacobi_iteration_anhole.py:97-272).
      "none" — no grammar (plain text / class-conditional LlamaGen).
    """

    kind: str = "none"
    image_start_id: int = -1
    image_end_id: int = -1
    newline_id: int = -1
    image_vocab_start: int = 0
    image_vocab_end: int = -1  # inclusive
    # lumina only
    size_token_base: int = 8804
    grid_scale: int = 2
    header_len: int = 3  # <image_start> <h_tok> <w_tok>
    # emu3 only
    eof_id: int = -1
    eos_id: int = -1
    pad_id: int = -1
    # emu3 only: the <|image token|> marker whose position anchors the
    # positional constraint (utils_emu3.py:47-50 counts offsets from it);
    # update_state arms in_image when it scans this id, so the prompt's own
    # tokens are never counted into img_count. -1 disables marker arming.
    img_token_id: int = -1
    # anole only (multimodal_generation_mode stacks,
    # scheduler/jacobi_iteration_anhole.py:121-272)
    image_seq_length: int = 1024
    # "image-only" | "text-only" | "interleaved" | "unrestricted"
    mode: str = "image-only"
    # suppress <boi> at prediction positions >= this (the "don't start an
    # image without room for image_seq_length tokens" range processor);
    # -1 disables. Positions are real (unpadded) sequence indices.
    boi_suppress_from: int = -1
    # image-only: eos may not be the first generated token
    # (SuppressTokensAtBeginLogitsProcessor3d with begin_index = prompt len)
    suppress_eos_at_begin: bool = False


class GrammarState(NamedTuple):
    """Per-sample dynamic grammar state, updated from committed tokens.

    in_image:      an <image_start> is open (starts == ends + 1)
    size_known:    grid dims resolved (always True for emu3/anole)
    h_lat, w_lat:  latent grid dims
    img_count:     committed tokens after the header (incl. <eol>s) — the
                   "len(tokens)" of logit_processor_3dim.py:118
    """

    in_image: jnp.ndarray  # [B] bool
    size_known: jnp.ndarray  # [B] bool
    h_lat: jnp.ndarray  # [B] int32
    w_lat: jnp.ndarray  # [B] int32
    img_count: jnp.ndarray  # [B] int32
    header_seen: jnp.ndarray  # [B] int32 — size tokens committed so far


def init_state(
    batch: int,
    *,
    h_lat: Optional[jnp.ndarray] = None,
    w_lat: Optional[jnp.ndarray] = None,
    in_image: bool = False,
) -> GrammarState:
    """Fresh state. Emu3/LlamaGen pass grid dims up front with in_image=True."""
    known = h_lat is not None
    return GrammarState(
        in_image=jnp.full((batch,), in_image),
        size_known=jnp.full((batch,), known),
        h_lat=h_lat if known else jnp.zeros((batch,), jnp.int32),
        w_lat=w_lat if known else jnp.zeros((batch,), jnp.int32),
        img_count=jnp.zeros((batch,), jnp.int32),
        header_seen=jnp.full((batch,), 2 if known else 0, jnp.int32),
    )


def update_state(
    spec: GrammarSpec,
    state: GrammarState,
    committed: jnp.ndarray,  # [B, W] tokens committed this step
    n_committed: jnp.ndarray,  # [B] count of real slots, or [B, W] bool mask
) -> GrammarState:
    """Advance the grammar state over up to W committed tokens.

    A short fori_loop over the static window width (<= ~16); each iteration is
    a few scalar selects per sample, negligible next to the model forward.
    ``n_committed`` may be a [B, W] boolean mask instead of a count (used to
    scan left-padded prompts at generation start).
    """
    if spec.kind == "none":
        return state

    W = committed.shape[1]
    mask_mode = n_committed.ndim == 2

    def step(j, st):
        tok = committed[:, j]
        live = n_committed[:, j] if mask_mode else (j < n_committed)

        is_start = live & (tok == spec.image_start_id)
        is_end = live & (tok == spec.image_end_id)

        in_image = jnp.where(is_start, True, st.in_image)

        if spec.kind == "lumina":
            # collect the two grid-size tokens after <image_start>
            collecting = live & st.in_image & (st.header_seen < 2) & ~is_end
            grid = (tok - spec.size_token_base) * spec.grid_scale
            h_lat = jnp.where(collecting & (st.header_seen == 0), grid, st.h_lat)
            w_lat = jnp.where(collecting & (st.header_seen == 1), grid, st.w_lat)
            header_seen = jnp.where(collecting, st.header_seen + 1, st.header_seen)
            size_known = header_seen >= 2
            body = live & st.in_image & st.size_known & ~is_end
            img_count = jnp.where(body, st.img_count + 1, st.img_count)
        elif spec.kind == "emu3":
            # Emu3's prefix constraint is positional for the whole generation:
            # <eof>/<image_end>/<eos>/<pad> are forced at offsets *past* the
            # grid end (utils_emu3.py:19-62), so the counter runs through
            # <image_end> and the state never closes. Offsets anchor at the
            # <|image token|> marker (utils_emu3.py:47-50): scanning it arms
            # in_image, and only tokens AFTER it count — st.in_image (the
            # pre-update value) gates the count so the marker itself and the
            # whole preceding prompt contribute zero. (Pre-arming in_image
            # before a prompt scan would count every prompt token and shift
            # every forced offset by the prompt length.)
            h_lat, w_lat = st.h_lat, st.w_lat
            header_seen = st.header_seen
            size_known = st.size_known
            img_count = jnp.where(live & st.in_image, st.img_count + 1, st.img_count)
            is_marker = live & (tok == spec.img_token_id)
            in_image_e = jnp.where(is_marker, True, st.in_image)
            return GrammarState(
                in_image_e, size_known, h_lat, w_lat, img_count, header_seen
            )
        else:
            h_lat, w_lat = st.h_lat, st.w_lat
            header_seen = st.header_seen
            size_known = st.size_known
            body = live & st.in_image & ~is_end
            img_count = jnp.where(body, st.img_count + 1, st.img_count)

        # closing the image resets the per-image counters
        in_image = jnp.where(is_end, False, in_image)
        img_count = jnp.where(is_end, 0, img_count)
        if spec.kind == "lumina":
            header_seen = jnp.where(is_end, 0, header_seen)
            size_known = jnp.where(is_end, False, size_known)
        return GrammarState(in_image, size_known, h_lat, w_lat, img_count, header_seen)

    return jax.lax.fori_loop(0, W, step, state)


def _force_rows(
    scores: jnp.ndarray,  # [B, W, V]
    force: jnp.ndarray,  # [B, W] bool — rows to overwrite
    token_id,  # int or [B] int32 — the single allowed token
) -> jnp.ndarray:
    """Rows where ``force`` holds become one-hot (0 at token_id, -inf else),
    matching get_eol_in_multitokens (logit_processor_3dim.py:31-43)."""
    V = scores.shape[-1]
    vocab = jnp.arange(V, dtype=jnp.int32)
    if isinstance(token_id, int):
        onehot = vocab[None, None, :] == token_id
    else:
        onehot = vocab[None, None, :] == token_id[:, None, None]
    forced = jnp.where(onehot, 0.0, NEG_INF)
    return jnp.where(force[:, :, None], forced, scores)


def apply_grammar(
    spec: GrammarSpec,
    state: GrammarState,
    scores: jnp.ndarray,  # [B, W, V] fp32
    *,
    pred_pos: Optional[jnp.ndarray] = None,  # [B, W] real position each row predicts
    begin_pos: Optional[jnp.ndarray] = None,  # [B] first generated position (prompt len)
) -> jnp.ndarray:
    """Constrain window scores. Row i predicts the token at image offset
    ``o_i = img_count + i`` (0-indexed within the post-header image span).
    ``pred_pos``/``begin_pos`` feed the position-range anole processors
    (boi room check, eos-at-begin); None skips those constraints."""
    if spec.kind == "none":
        return scores

    B, W, V = scores.shape
    vocab = jnp.arange(V, dtype=jnp.int32)
    is_image_tok = (vocab >= spec.image_vocab_start) & (vocab <= spec.image_vocab_end)

    i = jnp.arange(W, dtype=jnp.int32)[None, :]
    o = state.img_count[:, None] + i  # [B, W]
    w1 = state.w_lat[:, None] + 1  # row stride incl. <eol>
    if spec.kind == "anole":
        # anole images have a fixed length; there are no grid-size tokens to
        # wait for (jacobi_iteration_anhole.py grammar is armed by <boi> alone)
        active = state.in_image[:, None]
    else:
        active = (state.in_image & state.size_known)[:, None]  # [B, W]

    if spec.kind == "lumina":
        # suppress everything outside the image vocab, then force <eol> at
        # (o+1) % (w+1) == 0 and <image_end> at o == (w+1)*h
        # (logit_processor_3dim.py:107-155).
        suppressed = jnp.where(is_image_tok[None, None, :], scores, NEG_INF)
        scores = jnp.where(active[:, :, None], suppressed, scores)
        force_eol = active & (((o + 1) % jnp.maximum(w1, 1)) == 0)
        force_eoi = active & (o == w1 * state.h_lat[:, None])
        scores = _force_rows(scores, force_eol & ~force_eoi, spec.newline_id)
        scores = _force_rows(scores, force_eoi, spec.image_end_id)
        return scores

    if spec.kind == "emu3":
        # Emu3PrefixConstrainedLogitsHelper (emu3/mllm/utils_emu3.py:19-62),
        # vectorized over the window like EOLLogitProcessor3d
        # (jacobi_iteration_emu3.py:41-151). Offsets are 1-based from the
        # image start: position % (w+1) == 0 -> <eol>; (w+1)*h + 1 -> <eof>;
        # + 2 -> <image_end>; + 3 -> <eos>; beyond -> <pad>; else visual only.
        p = o + 1
        end = w1 * state.h_lat[:, None]
        # the reference checks eol FIRST, so every (w+1)-divisible offset is
        # <eol> even past the image end (utils_emu3.py:45-46)
        force_eol = active & (p % jnp.maximum(w1, 1) == 0)
        force_eof = active & (p == end + 1)
        force_eoi = active & (p == end + 2)
        force_eos = active & (p == end + 3)
        force_pad = active & (p > end + 3) & ~force_eol
        plain = active & ~(force_eol | force_eof | force_eoi | force_eos | force_pad)
        suppressed = jnp.where(is_image_tok[None, None, :], scores, NEG_INF)
        scores = jnp.where(plain[:, :, None], suppressed, scores)
        scores = _force_rows(scores, force_eol, spec.newline_id)
        scores = _force_rows(scores, force_eof, spec.eof_id)
        scores = _force_rows(scores, force_eoi, spec.image_end_id)
        scores = _force_rows(scores, force_eos, spec.eos_id)
        scores = _force_rows(scores, force_pad, spec.pad_id)
        return scores

    if spec.kind == "anole":
        # The multimodal_generation_mode stacks of the reference
        # (jacobi_iteration_anhole.py:170-262, processors at
        # logit_processor_3dim.py:207-353). Both Allow* processors run with
        # exclusive=True: image tokens are legal ONLY inside the
        # image_seq_length window after <boi>, and <eoi> ONLY at the exact
        # end offset — suppressed everywhere else.
        # Window rows are constrained by the state at WINDOW START: a <boi>
        # sampled mid-window leaves later rows of the same step constrained
        # as "outside an image". This matches the reference bit-for-bit (its
        # processors see all_collected_input_ids = committed ids only,
        # jacobi_iteration_lumina_mgpt.py:1078-1079 — proven by the lumina
        # in-window oracle test); the committed-text-inside-image hole in
        # interleaved mode exists in the reference too.
        if spec.mode == "unrestricted":
            return scores
        is_boi = vocab == spec.image_start_id
        is_eoi = vocab == spec.image_end_id
        if spec.mode == "text-only":
            # SuppressTokensLogitsProcessor3d(image_token_ids + [boi, eoi])
            banned = is_image_tok | is_boi | is_eoi
            return jnp.where(banned[None, None, :], NEG_INF, scores)

        L = spec.image_seq_length
        in_win = active & (o < L)  # image body rows: image vocab only
        at_eoi = active & (o == L)  # the closing row: <eoi> only
        outside = ~(in_win | at_eoi)

        suppressed = jnp.where(is_image_tok[None, None, :], scores, NEG_INF)
        scores = jnp.where(in_win[:, :, None], suppressed, scores)
        # the closing row keeps <eoi>'s original score and masks the rest
        # (AllowOnlyTokensAtRelativeOffset masks, it does not zero-force)
        scores = jnp.where(
            at_eoi[:, :, None] & ~is_eoi[None, None, :], NEG_INF, scores
        )
        # exclusive=True: image vocab and <eoi> are illegal outside their rows
        scores = jnp.where(
            outside[:, :, None] & (is_image_tok | is_eoi)[None, None, :],
            NEG_INF, scores,
        )
        # no <boi> without room for a whole image before the generation
        # budget runs out (SuppressTokensInIndexRangeLogitsProcessor3d on
        # boi). boi_suppress_from is a GENERATED-token offset (max_len is
        # prompt-exclusive); the reference's absolute start_index equals
        # prompt_len + this value, so the comparison anchors at begin_pos —
        # an absolute compare would suppress <boi> for ANY prompt longer
        # than the threshold (image-only mode then has every token at -inf
        # on the first generated position -> NaN probabilities).
        if spec.boi_suppress_from >= 0 and pred_pos is not None \
                and begin_pos is not None:
            gen_off = pred_pos - begin_pos[:, None]
            no_room = gen_off >= spec.boi_suppress_from  # [B, W]
            scores = jnp.where(
                no_room[:, :, None] & is_boi[None, None, :], NEG_INF, scores
            )
        if spec.mode == "image-only":
            # global allowlist {image, eos, boi, eoi}: text is never legal
            allowed = is_image_tok | is_boi | is_eoi | (vocab == spec.eos_id)
            scores = jnp.where(allowed[None, None, :], scores, NEG_INF)
            # eos may not be the very first generated token
            if spec.suppress_eos_at_begin and pred_pos is not None and begin_pos is not None:
                at_begin = pred_pos == begin_pos[:, None]
                scores = jnp.where(
                    at_begin[:, :, None] & (vocab == spec.eos_id)[None, None, :],
                    NEG_INF, scores,
                )
        return scores

    raise ValueError(f"unknown grammar kind {spec.kind!r}")


def forced_token_at(
    spec: GrammarSpec,
    state: GrammarState,
    o: jnp.ndarray,  # [B, K] image offsets (0-indexed within the image span)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Offsets where the grammar forces a single token with probability 1.

    Returns (forced [B, K] bool, token_id [B, K] int32). These are exactly
    the one-hot rows :func:`apply_grammar` produces — <eol> at row ends,
    <eof>/<image_end>/<eos>/<pad> past the grid (Emu3,
    emu3/mllm/utils_emu3.py:19-62), <image_end> at the grid end (Lumina,
    scheduler/logit_processor_3dim.py:107-155) and at offset
    image_seq_length (Anole). Used by drafts.build_window to PRE-PLACE the
    forced token in the draft window with a one-hot draft dist: the
    acceptance ratio p_new/p_draft there is exactly 1, so the slot is a
    certain accept instead of the certain reject a random seed guarantees
    (p_new(random) = 0 at a forced position). The reference could never do
    this — its draft init has no access to the stateful processors — and
    every reference window crossing a row boundary caps its acceptance at
    the <eol> slot. Speculative-sampling correctness is unaffected: the
    output law is independent of the draft distribution."""
    B, K = o.shape
    none_id = jnp.zeros((B, K), jnp.int32)
    if spec.kind == "none":
        return jnp.zeros((B, K), bool), none_id

    w1 = jnp.maximum(state.w_lat[:, None] + 1, 1)
    if spec.kind == "anole":
        if spec.mode in ("text-only", "unrestricted"):
            return jnp.zeros((B, K), bool), none_id
        active = state.in_image[:, None]
        forced = active & (o == spec.image_seq_length)
        return forced, jnp.where(forced, spec.image_end_id, 0)

    active = (state.in_image & state.size_known)[:, None]
    end = w1 * state.h_lat[:, None]
    if spec.kind == "lumina":
        force_eoi = active & (o == end)
        force_eol = active & (((o + 1) % w1) == 0) & ~force_eoi
        forced = force_eoi | force_eol
        tok = jnp.where(
            force_eoi, spec.image_end_id,
            jnp.where(force_eol, spec.newline_id, 0),
        )
        return forced, tok

    if spec.kind == "emu3":
        p = o + 1
        force_eol = active & (p % w1 == 0)
        force_eof = active & (p == end + 1)
        force_eoi = active & (p == end + 2)
        force_eos = active & (p == end + 3)
        force_pad = active & (p > end + 3) & ~force_eol
        forced = force_eol | force_eof | force_eoi | force_eos | force_pad
        # precedence = apply_grammar's _force_rows order (eol, eof, eoi, eos,
        # pad): the LAST applied force wins on overlap, which only happens for
        # degenerate grids (w_lat <= 2) but must match bit-for-bit regardless
        tok = jnp.where(force_eol, spec.newline_id, 0)
        tok = jnp.where(force_eof, spec.eof_id, tok)
        tok = jnp.where(force_eoi, spec.image_end_id, tok)
        tok = jnp.where(force_eos, spec.eos_id, tok)
        tok = jnp.where(force_pad, spec.pad_id, tok)
        return forced, tok

    raise ValueError(f"unknown grammar kind {spec.kind!r}")


def apply_grammar_single(
    spec: GrammarSpec,
    state: GrammarState,
    scores: jnp.ndarray,  # [B, V]
    offset_in_window: jnp.ndarray,  # [B] row index the scores correspond to
    *,
    pred_pos: Optional[jnp.ndarray] = None,  # [B] real position of that row
    begin_pos: Optional[jnp.ndarray] = None,  # [B]
) -> jnp.ndarray:
    """Grammar for a single residual-resample row at window offset k.

    Used by the speculative rejection path: the residual distribution
    max(0, p_new - p_draft) is re-constrained before resampling, matching
    reject_sampling_single_token (jacobi_iteration_lumina_mgpt.py:215-241).
    """
    if spec.kind == "none":
        return scores
    # Reuse the window implementation with a per-sample img_count shift.
    shifted = state._replace(img_count=state.img_count + offset_in_window)
    return apply_grammar(
        spec, shifted, scores[:, None, :],
        pred_pos=None if pred_pos is None else pred_pos[:, None],
        begin_pos=begin_pos,
    )[:, 0, :]
