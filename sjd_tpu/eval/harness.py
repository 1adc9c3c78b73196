"""Benchmark generation runner (layer L6).

The reference fans out one torch process per GPU and writes {index}.png per
prompt, skipping existing files for idempotent resume
(dataset_tools/multi_gpu_infer_with_prompt.py:45-125). On TPU a host drives
its chips through one JAX process; multi-host runs shard prompts statically
(eval/datasets.shard_prompts) with the filesystem as the only shared medium —
the same zero-communication design.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional, Sequence

from .datasets import PromptRecord


def run_prompt_set(
    sample_fn: Callable[[str], "object"],  # prompt -> PIL.Image
    records: Sequence[PromptRecord],
    workdir: str,
    *,
    log_every: int = 1,
    stats_path: Optional[str] = None,
) -> dict:
    """Generate {index}.png for every record, skipping existing outputs."""
    os.makedirs(workdir, exist_ok=True)
    done = skipped = 0
    latencies = []
    for rec in records:
        out = os.path.join(workdir, f"{rec.index}.png")
        if os.path.exists(out):
            skipped += 1
            continue
        t0 = time.time()
        image = sample_fn(rec.prompt)
        dt = time.time() - t0
        latencies.append(dt)
        # atomic write: a preemption mid-save would leave a truncated PNG
        # that the skip-existing resume then treats as complete forever
        tmp = out + ".tmp"
        image.save(tmp, format="PNG")
        os.replace(tmp, out)
        done += 1
        if log_every and done % log_every == 0:
            print(f"[{done}/{len(records)}] {rec.index}: {dt:.1f}s  {rec.prompt[:60]}")
    stats = {
        "generated": done,
        "skipped_existing": skipped,
        "mean_latency_s": sum(latencies) / len(latencies) if latencies else None,
    }
    if stats_path:
        with open(stats_path, "w") as f:
            json.dump(stats, f)
    return stats


def workdir_name(model_name: str, **hyperparams) -> str:
    """Derive the output dir from all hyperparameters, like eval_model.py's
    workdir naming (:139-142), so different configs never collide."""
    parts = [model_name] + [f"{k}-{v}" for k, v in sorted(hyperparams.items())]
    return "_".join(str(p).replace("/", "-") for p in parts)


def run_prompt_set_batched(
    model,  # LoadedModel with serving seams in .extras
    records: Sequence[PromptRecord],
    workdir: str,
    *,
    slots: int = 4,
    chunk_steps: int = 192,
    log_every: int = 1,
    stats_path: Optional[str] = None,
    seed_base: int = 0,
) -> dict:
    """Batched benchmark generation: pending prompts stream through
    ``slots`` engine slots (core/serving.py StreamingBatcher) instead of
    the B=1 `sample_fn` loop — measured 8.8 vs 5.6 img/min on one v5e chip
    at the Lumina 768px config (PERF_NOTES.md).

    Skip-existing resume is preserved at image granularity (each completed
    slot is decoded and atomically written as it finishes). Per-image
    outputs are bit-reproducible: each record submits with
    ``seed = seed_base + record.index`` onto its own per-slot rng stream
    (core/serving.py), so a resumed or re-sharded run regenerates identical
    images regardless of batch co-scheduling.

    Uses the loader's serving seams: extras["prompt_ids_fn"] (+ optional
    "neg_ids_fn"/"make_gstate", Emu3) or extras["embed_prompt_fn"]
    (LlamaGen) with "decode_image_fn".
    """
    from sjd_tpu.core.serving import StreamingBatcher

    os.makedirs(workdir, exist_ok=True)
    extras = model.extras
    decode = extras["decode_image_fn"]

    pending = []
    skipped = 0
    for rec in records:
        if os.path.exists(os.path.join(workdir, f"{rec.index}.png")):
            skipped += 1
        else:
            pending.append(rec)
    if not pending:
        stats = {"generated": 0, "skipped_existing": skipped,
                 "images_per_min": None}
        if stats_path:
            with open(stats_path, "w") as f:
                json.dump(stats, f)
        return stats

    embed_mode = "embed_prompt_fn" in extras and "prompt_ids_fn" not in extras
    if embed_mode:
        batcher = StreamingBatcher(
            model.engine, model.params, batch=slots, chunk_steps=chunk_steps,
            prompt_width=extras["prompt_width"],
            embed_dim=extras["embed_dim"],
        )

        # submit lazily in waves: eagerly submitting the whole shard would
        # materialize every prompt's [P, D] conditioning on the device at
        # once (a full Parti t2i run is ~1.6 GB of caption embeddings)
        def handles_iter():
            wave = 4 * slots
            queue = []
            for i, rec in enumerate(pending):
                pe, ne, pm = extras["embed_prompt_fn"](rec.prompt)
                queue.append(batcher.submit(
                    prompt_embeds=pe[0], neg_prompt_embeds=ne[0],
                    prompt_mask=pm[0] if pm is not None else None,
                    seed=seed_base + rec.index))
                while len(queue) >= wave:
                    yield queue.pop(0)
            yield from queue

        handles = handles_iter()
    else:
        prompt_rows = [extras["prompt_ids_fn"](rec.prompt) for rec in pending]
        neg = extras["neg_ids_fn"]() if "neg_ids_fn" in extras else None
        batcher = StreamingBatcher(
            model.engine, model.params, batch=slots, chunk_steps=chunk_steps,
            prompt_width=max(len(r) for r in prompt_rows),
            neg_width=len(neg) if neg is not None else 0,
            make_gstate=extras.get("make_gstate"),
        )
        handles = [
            batcher.submit(row, neg_prompt_ids=neg, seed=seed_base + rec.index)
            for rec, row in zip(pending, prompt_rows)
        ]

    t0 = time.time()
    done = 0
    # try/finally: a failed generation (handle.wait raising) must still shut
    # the batcher's drive thread down and record the partial progress —
    # leaking the daemon thread keeps device state alive for the rest of the
    # process, and the skip-existing resume relies on the images already
    # written (ADVICE r3).
    try:
        for rec, handle in zip(pending, handles):
            res = handle.wait()
            image = decode(res.tokens.tolist())
            out = os.path.join(workdir, f"{rec.index}.png")
            tmp = out + ".tmp"
            image.save(tmp, format="PNG")
            os.replace(tmp, out)
            done += 1
            if log_every and done % log_every == 0:
                print(f"[{done}/{len(pending)}] {rec.index}: {rec.prompt[:60]}")
    finally:
        batcher.close()
        wall = time.time() - t0
        stats = {
            "generated": done,
            "skipped_existing": skipped,
            "slots": slots,
            "wall_s": round(wall, 2),
            "images_per_min": round(60.0 * done / wall, 2) if wall else None,
        }
        if stats_path:
            with open(stats_path, "w") as f:
                json.dump(stats, f)
    return stats
