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
