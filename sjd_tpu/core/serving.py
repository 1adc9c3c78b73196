"""Continuous batching: stream prompts through a fixed-B SJD engine.

The jitted decode loop runs a batch until every sample finishes, so a fixed
batch pays for its slowest member (PERF_NOTES batch table: B=4 collapsed to
4.41 img/min vs B=2's 5.96 — NFE 1249 vs 1105). The engine's per-sample
lengths are exactly what continuous batching needs: ``ContinuousBatcher``
chunks the generation (engine.resume's donated-state machinery), harvests
finished slots at each chunk boundary, and refills them from a pending
prompt queue with one prefill forward (SJDEngine.refill) — live slots'
trajectories are preserved bit-exactly.

The reference has no counterpart (its multi-GPU inference is process-level
prompt sharding with B=1 per process, dataset_tools/multi_gpu_infer_with_
prompt.py); this is the TPU-serving answer to the same fan-out.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional

import numpy as np

import jax.numpy as jnp

PyTree = Any


@dataclasses.dataclass
class CompletedGeneration:
    prompt_index: int  # position in the input stream
    tokens: np.ndarray  # prompt + generation rows (left-aligned, unpadded tail)
    gen_count: int


class ContinuousBatcher:
    """Run a stream of same-width prompts through B engine slots.

    prompts: [N, P] int32 (pad shorter prompts and pass prompt_masks).
    ``chunk_steps`` trades refill latency against dispatch overhead — a
    finished slot idles for at most one chunk before being refilled.
    ``make_gstate(indices) -> GrammarState`` supplies per-prompt grammar
    state for families that need pre-armed dims (Emu3); default engines
    use their own default_gstate.
    """

    def __init__(
        self,
        engine,
        params: PyTree,
        *,
        chunk_steps: int = 128,
        make_gstate: Optional[Callable[[List[int]], Any]] = None,
        row_sharding: Any = None,
    ):
        self.engine = engine
        self.params = params
        self.chunk_steps = chunk_steps
        self.make_gstate = make_gstate
        # Data-parallel serving: a jax.sharding.Sharding (batch dim split
        # over the 'data' mesh axis) applied to every prompt batch fed to
        # generate/refill. The engine state inherits the sharding from its
        # inputs, so the whole decode loop — including refill/resume chunks
        # — runs SPMD with slots distributed across chips, bit-identical to
        # the single-device batcher (tests/test_continuous_batching.py).
        self.row_sharding = row_sharding

    def run(
        self,
        rng,
        prompts: np.ndarray,  # [N, P] int32
        prompt_masks: Optional[np.ndarray] = None,  # [N, P] bool
        batch: int = 4,
        neg_prompts: Optional[np.ndarray] = None,  # [N, Pn] (cfg_mode=neg_prompt)
    ) -> List[CompletedGeneration]:
        eng = self.engine
        N, P = prompts.shape
        B = min(batch, N)
        if prompt_masks is None:
            prompt_masks = np.ones((N, P), bool)

        slot_prompt = list(range(B))  # stream index occupying each slot
        next_idx = B
        done: List[CompletedGeneration] = []

        def batch_rows(idx_list):
            ids = jnp.asarray(prompts[idx_list], jnp.int32)
            mask = jnp.asarray(prompt_masks[idx_list], bool)
            neg = (
                jnp.asarray(neg_prompts[idx_list], jnp.int32)
                if neg_prompts is not None else None
            )
            g = self.make_gstate(list(idx_list)) if self.make_gstate else None
            if self.row_sharding is not None:
                import jax

                put = lambda a: jax.device_put(a, self.row_sharding)
                ids, mask = put(ids), put(mask)
                neg = put(neg) if neg is not None else None
            return ids, mask, neg, g

        ids, mask, neg, g = batch_rows(slot_prompt)
        res, state = eng.generate(
            self.params, rng, ids, prompt_mask=mask, neg_prompt=neg,
            gstate=g, max_steps=self.chunk_steps, return_state=True,
        )

        def harvest(state) -> List[int]:
            """Collect finished slots into ``done``; return their indices.

            Fetch order matters through a high-latency device tunnel: the
            [B] finished flags are one tiny transfer; the [B, L_buf] token
            rows are fetched ONLY for slots that actually finished (most
            chunk boundaries harvest nothing)."""
            finished = np.asarray(state.finished)
            hits = [
                b for b in range(B) if finished[b] and slot_prompt[b] is not None
            ]
            if not hits:
                return []
            lengths = np.asarray(state.length)
            prompt_rows = int(state.prompt_rows)
            for b in hits:
                row = np.asarray(state.tokens[b, : int(lengths[b])])
                done.append(CompletedGeneration(
                    prompt_index=slot_prompt[b],
                    tokens=row.copy(),
                    gen_count=int(lengths[b]) - prompt_rows,
                ))
                slot_prompt[b] = None
            return hits

        while True:
            freed = harvest(state)
            refill_slots = []
            for b in freed:
                if next_idx < N:
                    slot_prompt[b] = next_idx
                    refill_slots.append((b, next_idx))
                    next_idx += 1
            if all(s is None for s in slot_prompt):
                break  # queue drained and every slot harvested
            if refill_slots:
                # fresh rows only matter where refill_mask is set; dead
                # slots re-present their old prompt (ignored)
                idx_for_rows = [
                    next(
                        (i for bb, i in refill_slots if bb == b),
                        slot_prompt[b] if slot_prompt[b] is not None else 0,
                    )
                    for b in range(B)
                ]
                ids, mask, neg, g = batch_rows(idx_for_rows)
                refill_mask = np.zeros((B,), bool)
                for b, _ in refill_slots:
                    refill_mask[b] = True
                state = eng.refill(
                    self.params, state, ids, refill_mask,
                    prompt_mask=mask, neg_prompt=neg, gstate=g,
                )
            res, state = eng.resume(
                self.params, state, max_steps=self.chunk_steps,
                return_state=True,
            )

        done.sort(key=lambda c: c.prompt_index)
        return done
