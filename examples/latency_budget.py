"""Per-decode-step latency budget at the flagship config (verdict r5 #3).

Publishes a ms breakdown of one SJD decode step — Lumina-mGPT-7B, int4
W4A16, CFG batch 2, window 16 — so the ~3.5 ms/forward of non-matmul
residue (BENCH_r04: 9.9 ms/forward vs the ~6.4 ms int4 weight-read floor
from PERF_NOTES) is attributed instead of guessed. Components:

  weights_floor   pure dot chain over every decode weight (the HBM read
                  bound: all int4 projections + int8 head, one [32, .]
                  activation) — nothing else
  fwd             the full jitted window forward (trunk + head) incl.
                  attention, norms, RoPE, KV update, logits
  fwd_half_layers the forward with 16 of 32 layers (per-layer attribution)
  fwd_small_head  vocab 8192 head (head-read + logits attribution)
  sampling        process_window_logits + speculative acceptance on
                  [2, 16, V] (grammar, CFG combine, top-k, accept scan)
  engine_step     ms/forward measured inside generate (from a short run) —
                  fwd + sampling + state bookkeeping + dispatch

Prints one JSON dict. Run on the TPU chip (compile is cached).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(leaves[0].ravel()[:1])


def _timeit(fn, *args, iters=30):
    out = fn(*args)
    _fetch(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    return (time.time() - t0) / iters * 1000.0


def _dispatch_overhead_ms(iters=60):
    """Per-call dispatch cost of this runtime (host->device launch; on the
    axon tunnel each execute is an RPC). Every standalone probe here pays it
    once per call, while the engine amortizes ONE dispatch over a whole
    chunked while_loop generate — so probe components must be read net of
    this constant to be comparable with engine_step_ms. Measured as a chained
    trivial jitted op (data dependency defeats both XLA loop folding and
    async-dispatch queueing ahead)."""
    import jax

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    x = f(x)
    _fetch(x)
    t0 = time.time()
    for _ in range(iters):
        x = f(x)
    _fetch(x)
    return (time.time() - t0) / iters * 1000.0


def main():
    from sjd_tpu.models import init_params
    from sjd_tpu.models.chameleon import (
        IMAGE_START_ID,
        SIZE_TOKEN_BASE,
        lumina_engine,
    )
    from sjd_tpu.models.transformer import (
        init_kv_cache,
        persist_int4_params,
        quantize_weights,
    )
    from sjd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    window = int(os.environ.get("BUDGET_WINDOW", "16"))
    eng = lumina_engine(
        target_size=768, window=window, guidance_scale=3.0, image_top_k=2000,
        text_top_k=10, init="repeat_horizon", kv_quant=True,
        max_len=48 * 49 + 5,
    )
    cfg = eng.model_cfg
    params = jax.jit(
        lambda k: quantize_weights(init_params(k, cfg), bits=4, head_bits=8,
                                   config=cfg)
    )(jax.random.PRNGKey(0))
    params = persist_int4_params(params)
    jax.block_until_ready(params)

    B = 2  # CFG-doubled batch of the flagship single image
    W = window
    M = B * W
    out = {}

    # ---- weights_floor: every decode weight read once, nothing else -------
    def weight_chain(p, x):
        # x: [M, hidden]; runs x through every projection of every layer and
        # the head, accumulating a scalar so nothing is dead-code-eliminated
        L = p["layers"]
        h = cfg.hidden_size

        def dot(v, w):
            if isinstance(w, dict):
                q = w["q"].astype(jnp.bfloat16)
                y = jax.lax.dot_general(
                    v, q, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y = y * w["s"][None, :].astype(jnp.float32)
            else:
                y = v @ w.T
            return y.astype(jnp.bfloat16)

        def body(carry, lp):
            v, acc = carry
            ys = []
            for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
                w = lp[name]
                vin = v
                if isinstance(w, dict):
                    k_in = (w["q"].shape[-1])
                else:
                    k_in = w.shape[-1]
                if k_in != v.shape[-1]:
                    vin = jnp.zeros((M, k_in), jnp.bfloat16) + acc
                ys.append(dot(vin, w))
            acc = acc + sum(jnp.sum(y, dtype=jnp.float32) for y in ys) * 1e-20
            return (v, acc), None

        (v, acc), _ = jax.lax.scan(body, (x, jnp.float32(0.0)), L)
        logits = dot(x, p["lm_head"]) if "lm_head" in p else dot(x, p["head"])
        return acc + jnp.sum(logits, dtype=jnp.float32) * 1e-20

    head_key = "lm_head" if "lm_head" in params else "head"
    x0 = jnp.ones((M, cfg.hidden_size), jnp.bfloat16)
    wfloor = jax.jit(weight_chain)
    out["weights_floor_ms"] = round(_timeit(wfloor, params, x0), 2)

    # ---- full window forward ----------------------------------------------
    from sjd_tpu.models import decoder_model_fns

    # mirror the engine's KV-buffer sizing exactly (engine.py: buf + W + 1
    # rounded to whole 512-row chunks so chunked attention divides evenly)
    buf_len = eng.config.resolved_buf_len(64) + window + 1
    buf_len = (buf_len + 511) // 512 * 512
    ids = jnp.zeros((B, W), jnp.int32)
    pos = jnp.arange(W, dtype=jnp.int32)[None].repeat(B, 0) + 1200
    valid = jnp.ones((B, buf_len), bool)
    ce = jnp.full((B,), 1200, jnp.int32)

    import dataclasses as dc

    variants = {
        "fwd": {},
        "fwd_half_layers": {"num_layers": cfg.num_layers // 2},
        "fwd_small_head": {"vocab_size": 8192},
    }
    for name, ov in variants.items():
        c = dc.replace(cfg, **ov)
        p = params
        if ov:
            p = jax.jit(
                lambda k, c=c: quantize_weights(
                    init_params(k, c), bits=4, head_bits=8, config=c)
            )(jax.random.PRNGKey(1))
            p = persist_int4_params(p)
        model = decoder_model_fns(c, max_positions=buf_len + W + 8)
        kv = init_kv_cache(c, B, buf_len)
        # donate the cache exactly like the engine's _continue/_refill jits
        # (engine.py:178-179): without donation XLA copies the ~1.3 GB cache
        # every call and the probe reads ~6 ms slower than the real step
        fwd = jax.jit(
            lambda pp, kk: model.forward(pp, ids, pos, kk, ce, valid),
            donate_argnums=(1,))

        def run_fwd(kk, iters=30):
            lg, kk = fwd(p, kk)
            _fetch(lg)
            t0 = time.time()
            for _ in range(iters):
                lg, kk = fwd(p, kk)
            _fetch(lg)
            return (time.time() - t0) / iters * 1000.0, kk

        out[f"{name}_ms"], kv = run_fwd(kv)
        out[f"{name}_ms"] = round(out[f"{name}_ms"], 2)
        del kv, p

    # ---- sampling pipeline: grammar + CFG + top-k + acceptance -------------
    from sjd_tpu.core import acceptance as acc_lib
    from sjd_tpu.core import grammar as G
    from sjd_tpu.core import processors as procs
    from sjd_tpu.core import sampling as S

    V = cfg.vocab_size
    spec = eng.spec
    gstate = G.GrammarState(
        in_image=jnp.ones((1,), bool), size_known=jnp.ones((1,), bool),
        h_lat=jnp.full((1,), 48, jnp.int32), w_lat=jnp.full((1,), 48, jnp.int32),
        img_count=jnp.full((1,), 600, jnp.int32),
        header_seen=jnp.full((1,), 2, jnp.int32),
    )
    logits = jax.random.normal(jax.random.PRNGKey(2), (B, W, V), jnp.float32)
    pred_pos = jnp.arange(W, dtype=jnp.int32)[None] + 653
    begin = jnp.full((1,), 53, jnp.int32)
    draft_tok = jnp.zeros((1, W), jnp.int32) + 5
    draft_probs = jnp.full((1, W, V), 1.0 / V, jnp.float32)
    active_w = jnp.full((1,), W, jnp.int32)

    def samp(lg, key):
        probs = procs.process_window_logits(
            lg, spec, gstate, eng.sampling,
            force_no_cfg=jnp.zeros((1,), bool),
            pred_pos=pred_pos, begin_pos=begin,
        )  # [1, W, V] after CFG halving
        y = S.sample_from_probs(key, probs)
        res = acc_lib.speculative_accept(
            key, draft_tok, y, draft_probs, probs, active_w,
            lambda r, rl, rr: jnp.argmax(rl, -1).astype(jnp.int32),
        )
        return res.n, res.out_tokens

    out["sampling_ms"] = round(
        _timeit(jax.jit(samp), logits, jax.random.PRNGKey(3)), 2)

    # ---- per-call dispatch constant -----------------------------------------
    out["dispatch_ms"] = round(_dispatch_overhead_ms(), 2)

    # ---- engine step total (short measured generates) -----------------------
    # low fill: cache_end ramps ~53 -> ~450 (1 live 512-chunk of attention);
    # high fill: a ~1200-token prompt starts decode at the flagship run's
    # MEAN cache occupancy (3 live chunks), comparable with fwd_ms above
    size_tok = SIZE_TOKEN_BASE + 24
    for tag, text_len in (("lowfill", 50), ("highfill", 1200)):
        prompt = jnp.asarray(
            [[9000 + (i % 50) for i in range(text_len)]
             + [IMAGE_START_ID, size_tok, size_tok]],
            jnp.int32)
        res = eng.generate(params, jax.random.PRNGKey(0), prompt, max_steps=40)
        _fetch(res.tokens)
        t0 = time.time()
        res = eng.generate(params, jax.random.PRNGKey(1), prompt,
                           max_steps=200)
        _fetch(res.tokens)
        dt = time.time() - t0
        out[f"engine_step_{tag}_ms"] = round(dt / int(res.nfe) * 1000.0, 2)
        out[f"nfe_sampled_{tag}"] = int(res.nfe)
    out["config"] = {
        "model": "lumina-7B int4 W4A16 (int8 head)", "batch_cfg": B,
        "window": W, "kv_quant": True, "head": head_key,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
