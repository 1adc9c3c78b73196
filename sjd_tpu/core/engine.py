"""The SJD engine: ONE jit-compiled fixed-point decode loop for every model.

The reference implements the decode loop three times (JacobiSampler._sample,
scheduler/jacobi_iteration_lumina_mgpt.py:912-1251, re-used via class-swap by
jacobi_iteration_emu3.py and jacobi_iteration_anhole.py), with host-side
Python in the hot path: per-token acceptance reads, KV-cache truncation,
growing rectangular masks, tensor re-concatenation every step.

Here the whole generation is a single `lax.while_loop` inside one `jax.jit`:

  * static shapes: [B, L_max] token buffer, [S, layers, L_buf, Hkv, D] KV
    buffer, [B, W] draft window — nothing grows or shrinks;
  * KV "rollback" is free: acceptance only advances per-sample `length`;
    rejected rows are overwritten by the next window's in-place write;
  * CFG runs as a doubled leading batch half ([cond; uncond]) sharing one
    forward (prepare_cfg_input, reference :742-770), with the uncond prompt
    either attention-masked (Lumina, :755-760) or a separate padded negative
    prompt (Emu3, jacobi_iteration_emu3.py:234-278);
  * acceptance lengths are per-sample (the reference synchronizes the batch
    to the minimum, :362 — here divergent lengths just advance independent
    cache offsets).

Model-family differences (grammar, vocab spans, CFG mode, rope) enter as
*data* via GrammarSpec / SamplingParams / EngineConfig — adapters are
configuration, not code.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import acceptance as acceptance_lib
from . import drafts as drafts_lib
from . import grammar as grammar_lib
from . import processors as processors_lib
from . import sampling as sampling_lib

PyTree = Any


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static decode-loop configuration (the jacobi_param_dict equivalent)."""

    window: int = 16  # max_num_new_tokens
    # Multi-token decoding is active while the *real* sequence length is in
    # [prompt_len + interval_l, prompt_len + interval_r); outside it the loop
    # takes 1-token AR steps (reference :1025, :1142-1144).
    interval_l: int = 1
    interval_r: int = 10**9
    scheme: str = "speculative_jacobi"  # | "jacobi"
    init: str = "random"  # | "repeat_horizon" | "sample_horizon"
    # Maximum GENERATED tokens (prompt excluded): generation finishes when
    # real_len - prompt_len reaches this. A prompt-inclusive cap silently
    # strangled long or image-conditioned prompts — the per-family defaults
    # budget the image span only, but an i2i prompt alone is ~2.4k tokens.
    max_len: int = 4096
    buf_len: int = 0  # token buffer capacity; 0 -> max_len + 2*window + prompt rows
    eos_id: int = -1
    pad_id: int = 0
    nfe_cap: int = 0  # 0 -> max_len (an AR upper bound)
    cfg_mode: str = "none"  # | "mask_prompt" | "neg_prompt"
    # Pre-place grammar-forced tokens (<eol>/<eof>/<eoi>/<eos>/<pad> at their
    # exact grid offsets) in fresh draft slots with one-hot draft dists —
    # those slots become certain ACCEPTS (ratio = 1) instead of the certain
    # rejects random seeds guarantee (p_new(random) = 0 at a forced offset).
    # Output law is unchanged (speculative sampling is draft-agnostic);
    # measured NFE drops on every grammar family. Off reproduces the
    # reference's draft behavior bit-for-bit (its stateless init cannot see
    # the grammar, scheduler/jacobi_iteration_lumina_mgpt.py:470-596).
    grammar_seed: bool = True

    def resolved_buf_len(self, prompt_rows: int = 0) -> int:
        return self.buf_len or (self.max_len + 2 * self.window + prompt_rows)

    def resolved_nfe_cap(self) -> int:
        return self.nfe_cap or self.max_len


class ModelFns(NamedTuple):
    """What the engine needs from a backbone — the whole 'ModelAdapter'.

    forward(params, ids [S,T], positions [S,T], kv, cache_end [S],
            valid [S, L_buf], logits_tail) -> (logits [S, tail, V] fp32, kv)
    init_cache(batch, buf_len) -> KV pytree
    vocab_size: static int
    """

    forward: Callable[..., Any]
    init_cache: Callable[[int, int], Any]
    vocab_size: int


class EngineState(NamedTuple):
    rng: jax.Array
    tokens: jnp.ndarray  # [B, L_buf]
    length: jnp.ndarray  # [B] rows occupied (padded prompt + committed)
    n_pad: jnp.ndarray  # [S] left-pad / masked rows in the cached prefix
    kv: Any
    valid: jnp.ndarray  # [S, kv_buf_len] attendable-prefix mask
    carried_tokens: jnp.ndarray  # [B, W]
    carried_probs: jnp.ndarray  # [B, W, V]
    carried_count: jnp.ndarray  # [B]
    last_prob: jnp.ndarray  # [B, V]
    gstate: grammar_lib.GrammarState
    finished: jnp.ndarray  # [B] bool
    nfe: jnp.ndarray  # scalar int32 — model forwards (the reference's NFE)
    steps_multi: jnp.ndarray  # scalar int32 — forwards with window > 1
    prompt_len: jnp.ndarray  # [B] real (unpadded) prompt length
    prompt_rows: jnp.ndarray  # scalar int32 — padded prompt rows in `tokens`
    accept_hist: jnp.ndarray  # [W+1] int32 — decode steps by accepted length


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray  # [B, L_buf] (prompt + generation, left-aligned)
    length: jnp.ndarray  # [B] total rows (padded prompt + generated)
    nfe: jnp.ndarray  # scalar — number of model forwards
    steps_multi: jnp.ndarray
    gen_count: jnp.ndarray  # [B] tokens generated
    # acceptance-length histogram over decode steps x live samples: bin k =
    # how often speculative acceptance committed exactly k tokens (the
    # on-device observability counter behind GenerationStats.accept_rate —
    # the reference only prints totals, jacobi_iteration_lumina_mgpt.py:1213)
    accept_hist: jnp.ndarray  # [W+1] int32


class SJDEngine:
    """Configured decode engine; `generate` is jitted once per shape."""

    def __init__(
        self,
        model: ModelFns,
        config: EngineConfig,
        grammar_spec: grammar_lib.GrammarSpec,
        sampling_params: processors_lib.SamplingParams,
        *,
        ar_fast_path: bool = False,
    ):
        self.model = model
        self.config = config
        self.spec = grammar_spec
        # guidance_scale == 1.0 makes the CFG mix an identity (g*(c-u)+u == c),
        # so the doubled batch would be pure waste — and process_window_logits
        # would skip the collapse, leaking a [2B, W, V] tensor into acceptance.
        # Normalizing here keeps _S_factor and the processor in lockstep.
        do_cfg = (
            sampling_params.do_cfg
            and config.cfg_mode != "none"
            and sampling_params.guidance_scale != 1.0
        )
        self.sampling = dataclasses.replace(sampling_params, do_cfg=do_cfg)
        # Out-of-interval steps CAN take a width-1 forward via lax.cond
        # (_continue_impl), but measured on v5e the T=1 forward is SLOWER
        # than the T=16 one (17.1 vs 15.3 ms — partial-tile KV scatters and
        # skinny matmuls beat the saved FLOPs), so the wide step is the
        # default; pass ar_fast_path=True at CONSTRUCTION for hardware where
        # narrow steps win (the flag is baked into the traced while_loop at
        # the first generate/resume — flipping the attribute afterwards hits
        # the jit cache and is silently ignored).
        self.ar_fast_path = ar_fast_path
        # Factories may install a batch-size -> GrammarState builder here;
        # generate() uses it when the caller passes no gstate. Without it,
        # grammars that need pre-armed state (Emu3's grid dims) silently
        # no-op on the default init_state — generation wanders into text
        # tokens with no error pointing at the missing gstate.
        self.default_gstate: Optional[Callable[[int], Any]] = None
        # nfe_cap is a *traced* operand of the while_loop condition: one
        # compile serves every max_steps/resume budget (no per-cap recompile).
        # resume donates the incoming EngineState: its KV buffers are multi-GB
        # and alias the outputs in place — without donation every chunked
        # dispatch transiently holds TWO copies (a ~4.4 GB HBM spike on the
        # Emu3 8B 720p cache) plus the copy traffic.
        #
        # persisted_jit serializes the compiled executable to disk keyed on
        # (arg avals, this config key, source hash): a warm process start
        # loads it directly, skipping trace AND lowering — the phases the
        # persistent XLA cache cannot skip (measured 325 s of lowering on a
        # fully-cache-hit serving start; utils/aot_cache.py). Falls back to
        # plain jax.jit where the backend can't round-trip executables (CPU).
        from ..utils.aot_cache import persisted_jit

        def _aot_key() -> str:
            return repr((
                self.config, self.sampling, self.spec,
                getattr(self, "model_cfg", None), self.ar_fast_path,
                self.model.vocab_size,
            ))

        self._generate = persisted_jit(
            self._generate_impl, key_fn=_aot_key, tag="generate")
        self._continue = persisted_jit(
            self._continue_impl, donate_argnums=(1,), key_fn=_aot_key,
            tag="continue")
        self._refill = persisted_jit(
            self._refill_impl, donate_argnums=(1,), key_fn=_aot_key,
            tag="refill")

    # -- public API -----------------------------------------------------------

    def generate(
        self,
        params: PyTree,
        rng: jax.Array,
        prompt: Optional[jnp.ndarray] = None,  # [B, P] int32 (left-padded)
        prompt_mask: Optional[jnp.ndarray] = None,  # [B, P] bool
        neg_prompt: Optional[jnp.ndarray] = None,  # [B, P] for cfg_mode=neg_prompt
        neg_mask: Optional[jnp.ndarray] = None,
        gstate: Optional[grammar_lib.GrammarState] = None,
        prompt_embeds: Optional[jnp.ndarray] = None,  # [B, P, D] conditioning
        neg_prompt_embeds: Optional[jnp.ndarray] = None,  # [B, P, D]
        max_steps: Optional[int] = None,
        return_state: bool = False,
    ):
        """Generate from a token prompt or (LlamaGen-style) an embedding
        prompt — the conditioning prefix of llamagen/llamagen.py:383-391.

        ``rng`` is either ONE legacy uint32 key ([2] — split into B
        per-sample streams by batch position) or a [B, 2] stack of PER-SLOT
        keys. Per-slot keys make each sample's trajectory a function of its
        own key alone: the same (prompt, key) pair yields bit-identical
        tokens regardless of what occupies the other slots — the per-request
        seed-reproducibility contract of online serving (StreamingBatcher),
        matching the reference's per-run generator semantics
        (jacobi_iteration_lumina_mgpt.py:36-45, 1021-1023).

        ``max_steps`` bounds the number of forwards in THIS call; combined
        with ``return_state`` + :meth:`resume` it chunks one generation
        across multiple device dispatches (streaming/serving, or backends
        with a per-execution time cap)."""
        (prompt, prompt_mask, neg_prompt, neg_mask, gstate, prompt_embeds,
         neg_prompt_embeds) = self._normalize_prompt_inputs(
            prompt, prompt_mask, neg_prompt, neg_mask, gstate,
            prompt_embeds, neg_prompt_embeds,
        )
        rng = self._normalize_rng(rng, prompt.shape[0])
        cap = self.config.resolved_nfe_cap() if max_steps is None else max_steps
        state = self._generate(
            params, rng, prompt, prompt_mask, neg_prompt, neg_mask, gstate,
            prompt_embeds, neg_prompt_embeds, jnp.int32(cap),
        )
        result = self._result_from_state(state)
        return (result, state) if return_state else result

    @staticmethod
    def _normalize_rng(rng, batch: int) -> jnp.ndarray:
        """One legacy key [2] -> [B, 2] per-slot streams (split by batch
        position); a [B, 2] stack passes through (per-request keys)."""
        rng = jnp.asarray(rng)
        if rng.ndim == 1:
            return jax.random.split(rng, batch)
        assert rng.shape == (batch, 2), (
            f"rng must be one key [2] or per-slot keys [{batch}, 2]; got "
            f"{rng.shape}")
        return rng

    def _normalize_prompt_inputs(
        self, prompt, prompt_mask, neg_prompt, neg_mask, gstate,
        prompt_embeds, neg_prompt_embeds,
    ):
        """Shared generate()/refill() argument normalization: default masks,
        grammar state, CFG negative-prompt placeholders, and the zero-width
        embedding placeholders that keep the traced signatures static.
        One code path so prompt semantics can never drift between the
        initial generate and a continuous-batching refill."""
        if prompt_embeds is not None:
            B, P = prompt_embeds.shape[:2]
            if prompt is None:
                prompt = jnp.zeros((B, P), jnp.int32)
            assert prompt.shape == (B, P), (
                "prompt width must match prompt_embeds", prompt.shape, (B, P))
        else:
            B, P = prompt.shape
        if prompt_mask is None:
            prompt_mask = jnp.ones((B, P), bool)
        if gstate is None:
            gstate = (
                self.default_gstate(B) if self.default_gstate is not None
                else grammar_lib.init_state(B)
            )
        if self.sampling.do_cfg and self.config.cfg_mode == "neg_prompt":
            if prompt_embeds is not None:
                assert neg_prompt_embeds is not None and (
                    neg_prompt_embeds.shape == prompt_embeds.shape
                ), "embedding prompts require same-shape neg_prompt_embeds"
                neg_prompt = jnp.zeros((B, P), jnp.int32)
                neg_mask = jnp.ones((B, P), bool)
            else:
                assert neg_prompt is not None, (
                    "cfg_mode=neg_prompt requires neg_prompt"
                )
                if neg_mask is None:
                    neg_mask = jnp.ones_like(neg_prompt, dtype=bool)
        else:
            neg_prompt = jnp.zeros((B, 0), jnp.int32)
            neg_mask = jnp.zeros((B, 0), bool)
        if prompt_embeds is None:
            prompt_embeds = jnp.zeros((B, 0, 0), jnp.float32)
            neg_prompt_embeds = jnp.zeros((B, 0, 0), jnp.float32)
        elif neg_prompt_embeds is None:
            neg_prompt_embeds = jnp.zeros_like(prompt_embeds)
        return (prompt, prompt_mask, neg_prompt, neg_mask, gstate,
                prompt_embeds, neg_prompt_embeds)

    def resume(self, params: PyTree, state: EngineState,
               max_steps: Optional[int] = None, return_state: bool = False):
        """Continue a generation returned with return_state=True for up to
        ``max_steps`` more forwards.

        The incoming ``state`` is DONATED (its device buffers are reused in
        place); keep only the returned state, in the standard
        ``res, state = eng.resume(params, state, ...)`` pattern."""
        cap = int(state.nfe) + (
            max_steps if max_steps is not None else self.config.resolved_nfe_cap()
        )
        state = self._continue(params, state, jnp.int32(cap))
        result = self._result_from_state(state)
        return (result, state) if return_state else result

    def refill(
        self,
        params: PyTree,
        state: EngineState,
        prompt: jnp.ndarray,  # [B, P] — P must match the original prompt rows
        refill_mask,  # [B] bool — slots to replace with fresh prompts
        prompt_mask: Optional[jnp.ndarray] = None,
        neg_prompt: Optional[jnp.ndarray] = None,
        neg_mask: Optional[jnp.ndarray] = None,
        gstate: Optional[grammar_lib.GrammarState] = None,
        prompt_embeds: Optional[jnp.ndarray] = None,
        neg_prompt_embeds: Optional[jnp.ndarray] = None,
        rng: Optional[jnp.ndarray] = None,  # [B, 2] per-slot keys for the
        # refilled slots (rows outside refill_mask are ignored); None folds
        # fresh streams from the live state — deterministic but not
        # per-request-seeded
    ) -> EngineState:
        """Continuous batching: replace FINISHED slots with fresh prompts.

        The reference has no analogue (B=1 everywhere); the jitted loop
        otherwise runs every batch to the slowest sample (PERF_NOTES batch
        table: B=4 throughput collapsed below B=2). Called between
        resume() chunks: one prefill forward re-arms the selected slots
        (tokens/KV/grammar/lengths) while every other slot's state — and
        the shared rng stream — is preserved BIT-EXACTLY, so live
        generations are unperturbed (tests/test_continuous_batching.py).

        ``prompt`` must be padded to the same width as the original
        generate() prompt (serving buckets prompts anyway); rows where
        ``refill_mask`` is False are ignored. For embedding-conditioned
        engines (LlamaGen) pass ``prompt_embeds`` and prompt=None, exactly
        like generate(). ``rng`` seeds the refilled slots' per-slot streams
        (pass the request's PRNGKey row for reproducible-per-seed serving);
        live slots keep their own streams untouched either way. The incoming
        ``state`` is DONATED. nfe increases by 1 (the refill prefill
        forward).
        """
        (prompt, prompt_mask, neg_prompt, neg_mask, gstate, prompt_embeds,
         neg_prompt_embeds) = self._normalize_prompt_inputs(
            prompt, prompt_mask, neg_prompt, neg_mask, gstate,
            prompt_embeds, neg_prompt_embeds,
        )
        B = prompt.shape[0]
        if rng is None:
            # fold fresh per-slot streams from the live ones WITHOUT
            # advancing them — unfinished slots' future sampling must be
            # bit-identical to a no-refill resume
            rng = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                state.rng, state.nfe
            )
        else:
            rng = self._normalize_rng(rng, B)
        return self._refill(
            params, state, prompt, prompt_mask, neg_prompt, neg_mask, gstate,
            prompt_embeds, neg_prompt_embeds,
            jnp.asarray(refill_mask, bool), rng,
        )

    def _refill_impl(
        self, params, state: EngineState, prompt, prompt_mask, neg_prompt,
        neg_mask, gstate0, prompt_embeds, neg_prompt_embeds, refill_mask,
        rng_fill,
    ) -> EngineState:
        from ..models.transformer import unpack_int4_params

        params = unpack_int4_params(params)
        # Prefill into a SMALL prompt-rows cache; a second full-size cache
        # would transiently double KV HBM (OOM at 768px CFG B=4). 512-row
        # multiples keep the chunked/Pallas attention tiling valid.
        P_rows = prompt.shape[1]
        if self.config.cfg_mode == "neg_prompt" and self.sampling.do_cfg:
            P_rows = max(P_rows, neg_prompt.shape[1])
        big_rows = state.valid.shape[1]
        small = min(((P_rows + self.config.window + 512) // 512) * 512, big_rows)
        fresh = self._prefill_state(
            params, rng_fill, prompt, prompt_mask, neg_prompt, neg_mask,
            gstate0, prompt_embeds, neg_prompt_embeds, kv_buf_rows=small,
        )
        assert fresh.tokens.shape == state.tokens.shape, (
            f"refill prompt rows must reproduce the engine's buffer: got "
            f"{fresh.tokens.shape} vs {state.tokens.shape} — pad refill "
            f"prompts to the original prompt width"
        )
        m_b = refill_mask  # [B]
        m_s = self._tile(m_b)  # [S]

        def sel(mask):
            def pick(new, old):
                m = mask.reshape(mask.shape + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            return pick

        pick_b, pick_s = sel(m_b), sel(m_s)
        R = fresh.valid.shape[1]  # small-cache rows actually seeded

        def pick_kv(new, old):
            # KV leaves are [S, n_layers, rows, ...]: slot axis 0, row axis
            # 2. Only the first R rows carry fresh prompt KV — scatter them
            # into the donated full buffer; rows past R are untouched (they
            # are either live slots' history or garbage the refilled slot's
            # next window write overwrites).
            m = m_s.reshape((m_s.shape[0],) + (1,) * (new.ndim - 1))
            head = jnp.where(
                m, new, jax.lax.slice_in_dim(old, 0, R, axis=2)
            )
            return jax.lax.dynamic_update_slice_in_dim(old, head, 0, axis=2)

        kv = jax.tree.map(pick_kv, fresh.kv, state.kv)
        # valid: fresh rows [0, R) merge in; rows >= R were initialized True
        # by the original prefill for every slot and stay as-is
        valid_head = jnp.where(
            m_s[:, None], fresh.valid, state.valid[:, :R]
        )
        valid = jax.lax.dynamic_update_slice_in_dim(
            state.valid, valid_head, 0, axis=1
        )
        gstate = jax.tree.map(pick_b, fresh.gstate, state.gstate)
        return EngineState(
            # per-slot streams: refilled slots take their fresh (seeded)
            # stream; live slots' streams are untouched, so their future
            # sampling is bit-identical to a no-refill resume
            rng=pick_b(fresh.rng, state.rng),
            tokens=pick_b(fresh.tokens, state.tokens),
            length=pick_b(fresh.length, state.length),
            n_pad=pick_s(fresh.n_pad, state.n_pad),
            kv=kv,
            valid=valid,
            carried_tokens=pick_b(fresh.carried_tokens, state.carried_tokens),
            carried_probs=pick_b(fresh.carried_probs, state.carried_probs),
            carried_count=pick_b(fresh.carried_count, state.carried_count),
            last_prob=pick_b(fresh.last_prob, state.last_prob),
            gstate=gstate,
            finished=pick_b(fresh.finished, state.finished),
            nfe=state.nfe + 1,  # the refill prefill forward
            steps_multi=state.steps_multi,
            prompt_len=pick_b(fresh.prompt_len, state.prompt_len),
            prompt_rows=state.prompt_rows,
            accept_hist=state.accept_hist,
        )

    def _result_from_state(self, state: EngineState) -> GenerateResult:
        return GenerateResult(
            tokens=state.tokens,
            length=state.length,
            nfe=state.nfe,
            steps_multi=state.steps_multi,
            gen_count=state.length - state.prompt_rows,
            accept_hist=state.accept_hist,
        )

    # -- implementation --------------------------------------------------------

    @property
    def _S_factor(self) -> int:
        return 2 if self.sampling.do_cfg else 1

    def _tile(self, x: jnp.ndarray) -> jnp.ndarray:
        """Duplicate the batch into [cond; uncond] halves under CFG."""
        if self._S_factor == 1:
            return x
        return jnp.concatenate([x, x], axis=0)

    def _force_no_cfg(self, gstate: grammar_lib.GrammarState) -> jnp.ndarray:
        """CFG is gated to open image segments (check_is_force_no_cfg,
        jacobi_iteration_lumina_mgpt.py:70-80). Grammarless models (LlamaGen)
        have no image segment marker and the reference applies CFG
        unconditionally there (check_is_force_no_cfg returns False when no
        image_start_token_id exists; llamagen_solver.py passes none) — so
        kind="none" never disables CFG."""
        if self.spec.kind == "none":
            return jnp.zeros(gstate.in_image.shape, bool)
        return ~gstate.in_image

    def _continue_impl(self, params, state: EngineState, nfe_cap) -> EngineState:
        # Packed-int4 weights unpack to s4 HERE — explicitly outside the
        # while_loop. XLA's loop-invariant code motion does NOT hoist the
        # unpack chain out of the loop body (measured 35.8 ms/forward when
        # left inside vs 6.4 unpacked once vs 9.6 int8 on the 7B matmul
        # load); after this, every step reads packed s4 at half the int8
        # weight traffic. No-op for non-int4 pytrees.
        from ..models.transformer import unpack_int4_params

        params = unpack_int4_params(params)
        cfg = self.config
        W = cfg.window

        def cond(st: EngineState):
            return (~jnp.all(st.finished)) & (st.nfe < nfe_cap)

        if W == 1:
            return jax.lax.while_loop(
                cond, lambda st: self._step(params, st, 1), state
            )
        if not self.ar_fast_path:
            return jax.lax.while_loop(
                cond, lambda st: self._step(params, st, W), state
            )

        def body(st: EngineState) -> EngineState:
            # 1-token AR fast path: outside [interval_l, interval_r) the
            # reference pays a single-row forward (max_num_new_tokens=1,
            # jacobi_iteration_lumina_mgpt.py:1025, 1142-1144); a W-wide
            # forward there wastes W*(CFG factor) query rows. Both step
            # shapes compile once; the branch is picked at runtime.
            B = st.tokens.shape[0]
            real_len = st.length - st.n_pad[:B]
            in_interval = (real_len >= st.prompt_len + cfg.interval_l) & (
                real_len < st.prompt_len + cfg.interval_r
            )
            any_multi = jnp.any(in_interval & ~st.finished)
            return jax.lax.cond(
                any_multi,
                lambda s: self._step(params, s, W),
                lambda s: self._step(params, s, 1),
                st,
            )

        return jax.lax.while_loop(cond, body, state)

    def _generate_impl(
        self, params, rng, prompt, prompt_mask, neg_prompt, neg_mask, gstate0,
        prompt_embeds, neg_prompt_embeds, nfe_cap,
    ) -> EngineState:
        from ..models.transformer import unpack_int4_params

        params = unpack_int4_params(params)  # see _continue_impl
        state = self._prefill_state(
            params, rng, prompt, prompt_mask, neg_prompt, neg_mask, gstate0,
            prompt_embeds, neg_prompt_embeds,
        )
        # ---- decode loop -----------------------------------------------------
        return self._continue_impl(params, state, nfe_cap)

    def _prefill_state(
        self, params, rng, prompt, prompt_mask, neg_prompt, neg_mask, gstate0,
        prompt_embeds, neg_prompt_embeds, kv_buf_rows: Optional[int] = None,
    ) -> EngineState:
        """Build the post-prefill EngineState (no decode steps). ``params``
        must already be unpacked (unpack_int4_params).

        ``kv_buf_rows`` overrides the KV buffer length: the refill path
        prefizes into a SMALL prompt-rows-only cache and scatters those rows
        into the donated full cache — materializing a second full-size cache
        just to seed a few slots would transiently double KV HBM (an OOM at
        the 768px CFG B=4 config)."""
        use_embeds = prompt_embeds.ndim == 3 and prompt_embeds.shape[1] > 0
        cfg = self.config
        B, P = prompt.shape
        W = cfg.window
        V = self.model.vocab_size
        # Buffer rows = left-pad + real tokens. Pad can reach P-1 per sample,
        # a commit may overshoot max_len by W-1 before the finish check, and
        # finished rows keep issuing (never-read) W-wide writes at their
        # frozen length — so the default sizing budgets max_len + 2W + P.
        # Under cfg_mode="neg_prompt" BOTH prompts are left-padded to their
        # common width before prefill, so the budget must use that width — a
        # negative prompt longer than the positive one otherwise overflows
        # the buffer (crash) or trips the room guard early (truncated image).
        # An explicit buf_len is honored as given; the padded-length finish
        # guard in _step keeps writes in bounds either way (ADVICE r1).
        P_rows = P
        if cfg.cfg_mode == "neg_prompt" and self.sampling.do_cfg:
            P_rows = max(P, neg_prompt.shape[1])
        L_buf = cfg.resolved_buf_len(P_rows)
        # round the KV buffer to whole 512-row chunks so the live-prefix
        # chunked attention path (models/transformer.py:_attend_chunked)
        # divides exactly; a few extra int8 rows cost ~nothing
        kv_buf = kv_buf_rows if kv_buf_rows is not None else (L_buf + W + 1)
        align = 512 if kv_buf > 512 else 8
        kv_buf = ((kv_buf + align - 1) // align) * align
        S = B * self._S_factor

        if cfg.cfg_mode == "neg_prompt" and self.sampling.do_cfg:
            # left-pad the two prompts to a common length (the reference pads
            # in prepare_batch_cfg_model_inputs, jacobi_iteration_emu3.py:234-278)
            Pn = neg_prompt.shape[1]
            Pc = max(P, Pn)
            def lpad(ids, mask, tgt):
                pad = tgt - ids.shape[1]
                ids = jnp.pad(ids, ((0, 0), (pad, 0)), constant_values=cfg.pad_id)
                mask = jnp.pad(mask, ((0, 0), (pad, 0)), constant_values=False)
                return ids, mask
            pos_ids, pos_mask = lpad(prompt, prompt_mask, Pc)
            neg_ids, neg_mask2 = lpad(neg_prompt, neg_mask, Pc)
            prompt_s = jnp.concatenate([pos_ids, neg_ids], axis=0)
            mask_s = jnp.concatenate([pos_mask, neg_mask2], axis=0)
            prompt, prompt_mask = pos_ids, pos_mask
            P = Pc
        elif cfg.cfg_mode == "mask_prompt" and self.sampling.do_cfg:
            # uncond half = same ids, prompt masked down to its last token
            # (prepare_cfg_input, jacobi_iteration_lumina_mgpt.py:752-760)
            last_col = jnp.cumsum(prompt_mask.astype(jnp.int32), axis=1) == jnp.sum(
                prompt_mask.astype(jnp.int32), axis=1, keepdims=True
            )
            uncond_mask = prompt_mask & last_col
            prompt_s = jnp.concatenate([prompt, prompt], axis=0)
            mask_s = jnp.concatenate([prompt_mask, uncond_mask], axis=0)
        else:
            prompt_s = prompt
            mask_s = prompt_mask

        # ---- arm the grammar with the prompt content --------------------------
        # The reference's processors re-scan input_ids (which include the
        # prompt) every step; here the prompt is folded into the grammar
        # state once. Handles prompts that already contain <image_start> and
        # grid-size tokens (Lumina T2I templates, Emu3's boi+size header).
        gstate0 = grammar_lib.update_state(self.spec, gstate0, prompt, prompt_mask)

        # ---- prefill ---------------------------------------------------------
        kv = self.model.init_cache(S, kv_buf)
        valid = jnp.ones((S, kv_buf), bool)
        valid = valid.at[:, :P].set(mask_s)
        n_pad = jnp.sum(~mask_s, axis=1).astype(jnp.int32)  # [S]
        positions = jnp.maximum(jnp.cumsum(mask_s.astype(jnp.int32), axis=1) - 1, 0)

        # per-slot streams: split each sample's [2] key independently so a
        # slot's draws depend only on its own stream
        ks = sampling_lib.split_rows(rng, 2)  # [B, 2, 2]
        rng, rng_prefill = ks[:, 0], ks[:, 1]
        fwd_kwargs = {}
        if use_embeds:
            # LlamaGen-style conditioning prefix: the prompt enters as
            # embeddings; the token buffer rows under it are placeholders
            # whose KV lives in the cache and is never re-embedded.
            embeds_s = (
                jnp.concatenate([prompt_embeds, neg_prompt_embeds], axis=0)
                if self._S_factor == 2
                else prompt_embeds
            )
            fwd_kwargs["inputs_embeds"] = embeds_s
        logits, kv = self.model.forward(
            params,
            prompt_s.astype(jnp.int32),
            positions.astype(jnp.int32),
            kv,
            jnp.zeros((S,), jnp.int32),
            valid,
            logits_tail=1,
            **fwd_kwargs,
        )
        force_no_cfg = self._force_no_cfg(gstate0)
        prompt_len_b = jnp.sum(prompt_mask.astype(jnp.int32), axis=1)
        probs0 = processors_lib.process_window_logits(
            logits, self.spec, gstate0, self.sampling, force_no_cfg=force_no_cfg,
            pred_pos=prompt_len_b[:, None], begin_pos=prompt_len_b,
        )  # [B, 1, V]
        if self.sampling.greedy:
            y0 = jnp.argmax(probs0[:, 0, :], axis=-1).astype(jnp.int32)
            probs0 = sampling_lib.onehot_probs(y0, self.model.vocab_size)[:, None, :]
        else:
            y0 = sampling_lib.sample_from_probs(rng_prefill, probs0[:, 0, :])

        tokens = jnp.zeros((B, L_buf), jnp.int32)
        tokens = tokens.at[:, :P].set(prompt)
        tokens = tokens.at[:, P].set(y0)
        length = jnp.full((B,), P + 1, jnp.int32)
        prompt_len_real = jnp.sum(prompt_mask.astype(jnp.int32), axis=1)

        gstate = grammar_lib.update_state(
            self.spec, gstate0, y0[:, None], jnp.ones((B,), jnp.int32)
        )

        return EngineState(
            rng=rng,
            tokens=tokens,
            length=length,
            n_pad=n_pad,
            kv=kv,
            valid=valid,
            carried_tokens=jnp.zeros((B, W), jnp.int32),
            carried_probs=jnp.zeros((B, W, V), jnp.float32),
            carried_count=jnp.zeros((B,), jnp.int32),
            last_prob=probs0[:, 0, :],
            gstate=gstate,
            finished=(y0 == cfg.eos_id),
            nfe=jnp.int32(1),
            steps_multi=jnp.int32(0),
            prompt_len=prompt_len_real.astype(jnp.int32),
            prompt_rows=jnp.int32(P),
            accept_hist=jnp.zeros((W + 1,), jnp.int32),
        )

    def _step(self, params: PyTree, st: EngineState, w_step: int) -> EngineState:
        """One decode step over a ``w_step``-wide window (static; either the
        configured window or 1 for the out-of-interval AR fast path)."""
        cfg = self.config
        spec = self.spec
        B = st.tokens.shape[0]
        W = cfg.window  # state shapes stay full-width across lax.cond branches
        Wr = w_step
        V = self.model.vocab_size
        ks = sampling_lib.split_rows(st.rng, 4)  # [B, 4, 2] per-slot streams
        rng, rng_draft, rng_tok, rng_acc = (
            ks[:, 0], ks[:, 1], ks[:, 2], ks[:, 3]
        )

        # real (unpadded) sequence length drives the interval logic
        pad_b = st.n_pad[:B]
        real_len = st.length - pad_b
        lo = st.prompt_len + cfg.interval_l
        hi = st.prompt_len + cfg.interval_r
        in_interval = (real_len >= lo) & (real_len < hi)
        active_w = jnp.where(
            in_interval, jnp.minimum(Wr, hi - real_len), 1
        ).astype(jnp.int32)
        active_w = jnp.clip(active_w, 1, Wr)

        # ---- build the draft window -----------------------------------------
        win = drafts_lib.build_window(
            rng_draft,
            scheme=cfg.init,
            spec=spec,
            gstate=st.gstate,
            tokens=st.tokens,
            length=st.length,
            last_prob=st.last_prob,
            carried_tokens=st.carried_tokens,
            carried_probs=st.carried_probs,
            carried_count=st.carried_count,
            window=Wr,
            vocab_size=V,
            grammar_seed=cfg.grammar_seed,
        )

        # ---- one forward over the window (CFG: doubled batch) ----------------
        x_s = self._tile(win.x)
        cache_end = self._tile(st.length - 1)
        i = jnp.arange(Wr, dtype=jnp.int32)[None, :]
        positions = (self._tile(st.length)[:, None] - 1 - st.n_pad[:, None]) + i
        logits, kv = self.model.forward(
            params,
            x_s,
            positions.astype(jnp.int32),
            st.kv,
            cache_end.astype(jnp.int32),
            st.valid,
            logits_tail=None,
        )

        force_no_cfg = self._force_no_cfg(st.gstate)
        pred_pos = real_len[:, None] + i  # row i predicts real position len+i
        probs = processors_lib.process_window_logits(
            logits, spec, st.gstate, self.sampling, force_no_cfg=force_no_cfg,
            pred_pos=pred_pos, begin_pos=st.prompt_len,
        )  # [B, Wr, V]

        if self.sampling.greedy:
            # Greedy decoding sharpens the model dist to a one-hot so the
            # speculative acceptance test r < p_new/p_draft degenerates to
            # exact argmax matching and SJD bit-matches AR decoding.
            y = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            probs = sampling_lib.onehot_probs(y, V)
        else:
            y = sampling_lib.sample_from_probs(rng_tok, probs)

        # ---- acceptance -------------------------------------------------------
        def resample_fn(r, residual_logits, reject_row):
            p = processors_lib.process_residual_logits(
                residual_logits, spec, st.gstate, self.sampling, reject_row,
                pred_pos=real_len + reject_row, begin_pos=st.prompt_len,
            )
            if self.sampling.greedy:
                return jnp.argmax(p, axis=-1).astype(jnp.int32)
            return sampling_lib.sample_from_probs(r, p)

        if cfg.scheme == "speculative_jacobi":
            res = acceptance_lib.speculative_accept(
                rng_acc, win.x, y, win.p_draft, probs, active_w, resample_fn
            )
        elif cfg.scheme == "jacobi":
            res = acceptance_lib.jacobi_accept(win.x, y, probs, active_w)
        else:
            raise ValueError(f"unknown scheme {cfg.scheme!r}")

        n_eff = jnp.where(st.finished, 0, res.n).astype(jnp.int32)
        live = (~st.finished).astype(jnp.int32)
        hist_inc = jnp.sum(
            jax.nn.one_hot(n_eff, W + 1, dtype=jnp.int32) * live[:, None], axis=0
        )

        # ---- commit -----------------------------------------------------------
        def commit_row(buf, out, off):
            return jax.lax.dynamic_update_slice(buf, out, (off,))

        tokens = jax.vmap(commit_row)(st.tokens, res.out_tokens, st.length)
        length = st.length + n_eff

        gstate = grammar_lib.update_state(spec, st.gstate, res.out_tokens, n_eff)

        last_prob = acceptance_lib._gather_rows(res.out_probs, res.n - 1)
        carried_count = jnp.where(st.finished, 0, res.carried_count)

        j = jnp.arange(Wr, dtype=jnp.int32)[None, :]
        committed_live = j < n_eff[:, None]
        hit_eos = jnp.any(committed_live & (res.out_tokens == cfg.eos_id), axis=1)
        # Semantic cap on GENERATED tokens (max_len excludes the prompt),
        # plus a padded-length guard that keeps every future W-wide commit
        # write inside the buffer (rows used include left-pad;
        # dynamic_update_slice would otherwise clamp the offset and silently
        # overwrite committed tokens — ADVICE r1).
        L_buf = st.tokens.shape[1]
        gen_len = real_len - st.prompt_len
        out_of_room = (gen_len + n_eff >= jnp.int32(cfg.max_len)) | (
            length > jnp.int32(L_buf - 2 * W)
        )
        finished = st.finished | hit_eos | out_of_room

        # widen step-local arrays back to the full window so both lax.cond
        # branches return an identical state structure
        def pad_w(a):
            if Wr == W:
                return a
            widths = [(0, 0), (0, W - Wr)] + [(0, 0)] * (a.ndim - 2)
            return jnp.pad(a, widths)

        return EngineState(
            rng=rng,
            tokens=tokens,
            length=length,
            n_pad=st.n_pad,
            kv=kv,
            valid=st.valid,
            carried_tokens=pad_w(res.carried_tokens),
            carried_probs=pad_w(res.carried_probs),
            carried_count=carried_count,
            last_prob=last_prob,
            gstate=gstate,
            finished=finished,
            nfe=st.nfe + 1,
            steps_multi=st.steps_multi + jnp.any(active_w > 1).astype(jnp.int32),
            prompt_len=st.prompt_len,
            prompt_rows=st.prompt_rows,
            accept_hist=st.accept_hist + hist_inc,
        )
