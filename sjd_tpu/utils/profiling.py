"""Tracing / profiling utilities (SURVEY.md §5 aux subsystems).

The reference times generation with CUDA events and prints NFE + token
counts from inside _sample (jacobi_iteration_lumina_mgpt.py:1050-1055,
1213-1223) and ablates component latency with forward-hook stubs
(evaluation_metrics.py:64-109). TPU-native equivalents:

  * `trace(path)` — context manager around jax.profiler for Perfetto/XProf
    traces of the jitted decode loop;
  * `GenerationStats` — NFE, tokens, accept rate, wall-clock derived from the
    engine's GenerateResult (counters computed on device, read once at end);
  * `time_block` — wall-clock with block_until_ready semantics.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def time_block(label: str = "", result_holder: Optional[dict] = None):
    t0 = time.time()
    yield
    dt = time.time() - t0
    if result_holder is not None:
        result_holder[label or "elapsed"] = dt
    if label:
        print(f"[{label}] {dt:.3f}s")


@dataclasses.dataclass
class GenerationStats:
    """The reference's printed counters, structured."""

    wall_s: float
    nfe: int  # "gen loop num (NFE)"
    tokens: int  # "tokens length"
    accept_rate: float  # mean committed tokens per forward
    # per-step acceptance-length histogram (bin k = decode steps that
    # committed exactly k tokens), accumulated on device by the engine
    accept_hist: Optional[tuple] = None

    @classmethod
    def from_result(cls, result: Any, wall_s: float) -> "GenerationStats":
        nfe = int(result.nfe)
        tokens = int(result.gen_count.max())
        hist = getattr(result, "accept_hist", None)
        return cls(
            wall_s=wall_s,
            nfe=nfe,
            tokens=tokens,
            accept_rate=tokens / max(nfe, 1),
            accept_hist=tuple(int(x) for x in hist) if hist is not None else None,
        )

    def __str__(self) -> str:
        return (
            f"Time elapsed inner: {self.wall_s:.2f}s | gen loop num (NFE): "
            f"{self.nfe} | tokens length: {self.tokens} | "
            f"accept {self.accept_rate:.2f} tok/fwd"
        )


def timed_generate(engine, params, rng, *args, **kwargs):
    """generate() + block + stats — the count_time block of the reference."""
    t0 = time.time()
    res = engine.generate(params, rng, *args, **kwargs)
    jax.block_until_ready(res.tokens)
    stats = GenerationStats.from_result(res, time.time() - t0)
    return res, stats
