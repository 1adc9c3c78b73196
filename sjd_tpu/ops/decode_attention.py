"""Pallas TPU kernel: fused SJD windowed-decode attention over the static KV
cache (SURVEY.md §7 kernel (a)).

One kernel instance handles one (sample, kv-head) pair and computes, fully in
VMEM:
  * int8 KV dequantization (per-row scales) — the dequantized cache never
    touches HBM;
  * the prefix + window-causal + CFG-valid mask as index arithmetic — the
    reference materializes a growing [W, L] rectangular mask in memory every
    step (jacobi_iteration_lumina_mgpt.py:816-846); here it is never
    materialized at all;
  * fp32 softmax and the PV product.

Shapes are draft-window sized: q [S, W*G, D] per kv-head (W<=32 window, G =
query-group size), K/V [L_buf, D] rows. Even Emu3's 8.3k-row cache fits VMEM
as int8 (~1 MB), so a single-shot softmax suffices — no online/flash pass,
which only pays off when K can't be resident.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _decode_attn_kernel(
    cache_end_ref,  # SMEM [S] int32 (scalar prefetch)
    q_ref,  # [1, 1, GW, D] compute dtype
    k_ref,  # [1, 1, L, D] int8 or compute dtype
    v_ref,  # [1, 1, L, D]
    ks_ref,  # [1, 1, L, 1] bf16 (ones when not quantized)
    vs_ref,  # [1, 1, L, 1] bf16
    valid_ref,  # [1, 1, L] int8
    o_ref,  # [1, 1, GW, D]
    *,
    window: int,
    group: int,
    quantized: bool,
):
    s = pl.program_id(0)
    cache_end = cache_end_ref[s]

    q = q_ref[0, 0, :, :]  # [GW, D]
    GW, D = q.shape
    L = k_ref.shape[2]

    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    if quantized:
        k = k.astype(jnp.float32) * ks_ref[0, 0, :, :].astype(jnp.float32)
        v = v.astype(jnp.float32) * vs_ref[0, 0, :, :].astype(jnp.float32)
    else:
        k = k.astype(jnp.float32)
        v = v.astype(jnp.float32)

    scores = jax.lax.dot_general(
        q.astype(jnp.float32),
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / math.sqrt(D))  # [GW, L]

    # rows are laid out [window, group]: query row r belongs to window slot
    # r // group. allowed(j) = j <= cache_end + w_idx and valid[j]
    row = jax.lax.broadcasted_iota(jnp.int32, (GW, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (GW, L), 1)
    w_idx = row // group
    causal = col <= cache_end + w_idx
    ok = valid_ref[0, 0, :].astype(jnp.int32)[None, :] > 0
    scores = jnp.where(causal & ok, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / denom
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("window", "interpret"),
)
def decode_attention(
    q: jnp.ndarray,  # [S, W, H, D]
    k_cache: jnp.ndarray,  # [S, L, Hkv, D] int8 or bf16 (window rows written)
    v_cache: jnp.ndarray,
    k_scale,  # [S, L, Hkv] bf16 or None
    v_scale,
    cache_end: jnp.ndarray,  # [S] int32
    valid: jnp.ndarray,  # [S, L] bool
    *,
    window: int,
    interpret: bool = False,
) -> jnp.ndarray:
    S, W, H, D = q.shape
    if cache_end.ndim == 0:
        cache_end = jnp.full((S,), cache_end, jnp.int32)
    L, Hkv = k_cache.shape[1], k_cache.shape[2]
    group = H // Hkv
    quantized = k_cache.dtype == jnp.int8
    # kernel blocks want head-major [S, Hkv, L, D]; this transpose is why the
    # kernel is an experimental non-default (attention is not the decode
    # bottleneck on v5e — see DecoderConfig.attn_impl)
    k_cache = k_cache.transpose(0, 2, 1, 3)
    v_cache = v_cache.transpose(0, 2, 1, 3)
    if k_scale is not None:
        k_scale = k_scale.transpose(0, 2, 1)
        v_scale = v_scale.transpose(0, 2, 1)

    # [S, W, H, D] -> [S, Hkv, W*G, D] with row r = w*group + g
    qh = q.reshape(S, W, Hkv, group, D).transpose(0, 2, 1, 3, 4)
    qh = qh.reshape(S, Hkv, W * group, D)

    if k_scale is None:
        k_scale = jnp.ones((S, Hkv, L), jnp.bfloat16)
        v_scale = jnp.ones((S, Hkv, L), jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(
            _decode_attn_kernel, window=window, group=group, quantized=quantized
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S, Hkv),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, W * group, D), lambda s, h, ce: (s, h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, L, D), lambda s, h, ce: (s, h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, L, D), lambda s, h, ce: (s, h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, L, 1), lambda s, h, ce: (s, h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, L, 1), lambda s, h, ce: (s, h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, L), lambda s, h, ce: (s, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, W * group, D), lambda s, h, ce: (s, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((S, Hkv, W * group, D), q.dtype),
        interpret=interpret,
    )(
        cache_end.astype(jnp.int32),
        qh,
        k_cache,
        v_cache,
        k_scale[..., None],
        v_scale[..., None],
        valid.astype(jnp.int8)[:, None, :],
    )
    # [S, Hkv, W*G, D] -> [S, W, H, D]
    out = out.reshape(S, Hkv, W, group, D).transpose(0, 2, 1, 3, 4)
    return out.reshape(S, W, H, D)
