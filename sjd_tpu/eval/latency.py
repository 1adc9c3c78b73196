"""Component-latency probes — the reference's `test_latencies` ablation
(evaluation_metrics.py:25-109), which stubs out model components with forward
hooks to attribute step time. The TPU equivalent measures jitted variants of
the decode step with components disabled (hooks don't exist under jit; a
recompiled ablated graph is the honest equivalent).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _fetch(out) -> None:
    """True completion barrier: copy one leaf to host. block_until_ready
    alone can return before the TPU tunnel actually finishes executing
    (observed on the axon runtime: a 15 s generate "measured" 0.06 s)."""
    import numpy as np

    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(jax.tree_util.tree_map(lambda x: x.ravel()[:1], leaves[0]))


def _timeit(fn, *args, iters: int = 20, **kwargs) -> float:
    out = fn(*args, **kwargs)
    _fetch(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _fetch(out)
    return (time.time() - t0) / iters


def decode_step_latencies(
    model_cfg,
    params,
    *,
    batch: int = 2,
    window: int = 16,
    buf_len: int = 2500,
    cache_fill: int = 1200,
    iters: int = 20,
    variants: Optional[Dict[str, dict]] = None,
) -> Dict[str, float]:
    """Times the window forward under config ablations. Default variants:
    the full model, half the layers (attributes per-layer cost), and a
    reduced-vocab head (attributes the logits head)."""
    from ..models import decoder_model_fns, init_params
    from ..models.transformer import init_kv_cache

    if variants is None:
        variants = {
            "full": {},
            "half_layers": {"num_layers": max(model_cfg.num_layers // 2, 1)},
            "small_head": {"vocab_size": 8192},
        }

    ids = jnp.zeros((batch, window), jnp.int32)
    pos = jnp.arange(window, dtype=jnp.int32)[None].repeat(batch, 0)
    valid = jnp.ones((batch, buf_len), bool)
    ce = jnp.full((batch,), cache_fill, jnp.int32)

    results = {}
    for name, overrides in variants.items():
        cfg = dataclasses.replace(model_cfg, **overrides)
        p = params
        if overrides:  # ablated shapes need fresh (random) parameters
            p = jax.jit(lambda k: init_params(k, cfg))(jax.random.PRNGKey(0))
        model = decoder_model_fns(cfg, max_positions=buf_len + window + 8)
        kv = init_kv_cache(cfg, batch, buf_len)
        fwd = jax.jit(
            lambda pp, kk: model.forward(pp, ids, pos, kk, ce, valid)[0]
        )
        results[name] = _timeit(fwd, p, kv, iters=iters)
        del kv
    return results
