"""Bind a generic decoder config into the engine's ModelFns interface.

This is the TPU replacement for the reference's runtime `__class__`-swapping
("renew_*" functions, e.g. renew_pipeline_sampler at
scheduler/jacobi_iteration_lumina_mgpt.py:1340-1346): instead of mutating a
loaded model's class to inject the scheduler, the backbone exposes a pure
forward closure and everything model-specific is configuration.
"""

from __future__ import annotations

from typing import Optional

from ..core.engine import ModelFns
from . import transformer


def decoder_model_fns(
    cfg: transformer.DecoderConfig,
    *,
    max_positions: Optional[int] = None,
) -> ModelFns:
    """ModelFns for the generic decoder with a precomputed RoPE table."""
    rope = transformer.make_rope_table(cfg, max_positions)

    def forward(params, ids, positions, kv, cache_end, valid, logits_tail=None,
                inputs_embeds=None):
        out = transformer.forward(
            params,
            cfg,
            ids,
            positions,
            kv,
            cache_end,
            valid,
            rope,
            logits_tail=logits_tail,
            inputs_embeds=inputs_embeds,
        )
        return out.logits, out.kv

    def init_cache(batch: int, buf_len: int):
        return transformer.init_kv_cache(cfg, batch, buf_len)

    return ModelFns(forward=forward, init_cache=init_cache, vocab_size=cfg.vocab_size)
