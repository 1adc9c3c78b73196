"""Pallas TPU kernel: fused per-layer attention epilogue for the SJD decode
step — qk-norm + RoPE + int8 KV quantization in ONE kernel.

The decode step is weight-read-bound (~5.5 ms floor on the 7B int4 config),
but ~2 ms/step of residual latency comes from the per-layer chain of small
XLA fusions between the qkv projections and attention
(PERF_NOTES.md step budget): per layer that chain is

  reshape -> LayerNorm(q) -> LayerNorm(k)      (4 reduces + affine)
  -> rotate_half/rope(q), rope(k)              (split/concat/mul/add)
  -> abs-max(k), abs-max(v) -> scale -> round/clip/cast  (quantize)

— each reduce is a fusion boundary, so XLA emits ~8 kernels of a few
microseconds' launch/tile overhead x 32 layers. This kernel computes the
whole chain in one VMEM-resident pass over the [T, H, D] window (the window
is tiny — 16 x 32 x 128 — the cost is overhead, not FLOPs).

Matches the reference per-layer op sequence modeling_chameleon.py:270-340
(qk LayerNorm -> rope -> cache write), with the int8 cache quantization
being this framework's addition. Bit-parity with the unfused jnp ops is
asserted in tests/test_pallas_ops.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _epilogue_kernel(
    qp_ref,  # [1, T, Hq*D]
    kp_ref,  # [1, T, Hkv*D]
    vp_ref,  # [1, T, Hkv*D]
    qns_ref,  # [Hq, D] (ones/zeros when qk_norm off)
    qnb_ref,
    kns_ref,  # [Hkv, D]
    knb_ref,
    cos_ref,  # [1, T, D] f32
    sin_ref,
    q_out,  # [1, T, Hq, D] compute dtype
    k_out,  # [1, T, Hkv, D] int8 (or compute dtype when not quantizing)
    v_out,
    ks_out,  # [1, T, Hkv] bf16
    vs_out,
    *,
    qk_norm: bool,
    quantize: bool,
    eps: float,
):
    T = qp_ref.shape[1]
    Hq, D = q_out.shape[2], q_out.shape[3]
    Hkv = k_out.shape[2]

    cos = cos_ref[0][:, None, :]  # [T, 1, D]
    sin = sin_ref[0][:, None, :]

    dt = qp_ref.dtype

    # Intermediate casts mirror the unfused jnp chain EXACTLY (norm and rope
    # each round to the compute dtype before the next op, transformer.py
    # head_layer_norm/apply_rope) so fused and unfused paths are
    # bit-identical — acceptance statistics and decode parity tests see the
    # same numbers either way.
    def norm(x, scale, bias):  # x: [T, H, D]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + eps)
        out = xn * scale[None].astype(jnp.float32) + bias[None].astype(
            jnp.float32
        )
        return out.astype(dt)

    def rope(x):  # [T, H, D] dt -> dt
        xf = x.astype(jnp.float32)
        half = D // 2
        a = xf[..., :half]
        b = xf[..., half:]
        rot = jnp.concatenate([-b, a], axis=-1)
        return (xf * cos + rot * sin).astype(dt)

    q = qp_ref[0].reshape(T, Hq, D)
    k = kp_ref[0].reshape(T, Hkv, D)
    v = vp_ref[0].reshape(T, Hkv, D)

    if qk_norm:
        q = norm(q, qns_ref[...], qnb_ref[...])
        k = norm(k, kns_ref[...], knb_ref[...])
    q = rope(q)
    k = rope(k)

    q_out[0] = q.astype(q_out.dtype)

    if quantize:
        k = k.astype(jnp.float32)
        v = v.astype(jnp.float32)
        k_amax = jnp.max(jnp.abs(k), axis=-1)  # [T, Hkv]
        v_amax = jnp.max(jnp.abs(v), axis=-1)
        k_s = jnp.maximum(k_amax / 127.0, 1e-8)
        v_s = jnp.maximum(v_amax / 127.0, 1e-8)
        k_out[0] = jnp.clip(
            jnp.round(k / k_s[..., None]), -127, 127
        ).astype(jnp.int8)
        v_out[0] = jnp.clip(
            jnp.round(v / v_s[..., None]), -127, 127
        ).astype(jnp.int8)
        ks_out[0] = k_s.astype(ks_out.dtype)
        vs_out[0] = v_s.astype(vs_out.dtype)
    else:
        k_out[0] = k.astype(k_out.dtype)
        v_out[0] = v.astype(v_out.dtype)
        ks_out[0] = jnp.ones((T, Hkv), ks_out.dtype)
        vs_out[0] = jnp.ones((T, Hkv), vs_out.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "num_kv_heads", "head_dim", "qk_norm",
                     "quantize", "eps", "interpret"),
)
def fused_epilogue(
    qp: jnp.ndarray,  # [S, T, Hq*D]
    kp: jnp.ndarray,  # [S, T, Hkv*D]
    vp: jnp.ndarray,  # [S, T, Hkv*D]
    q_norm_scale: Optional[jnp.ndarray],  # [Hq, D]
    q_norm_bias: Optional[jnp.ndarray],
    k_norm_scale: Optional[jnp.ndarray],  # [Hkv, D]
    k_norm_bias: Optional[jnp.ndarray],
    cos: jnp.ndarray,  # [S, T, D]
    sin: jnp.ndarray,
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    qk_norm: bool,
    quantize: bool,
    eps: float = 1e-5,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (q [S,T,Hq,D] dtype-of-qp, k, v [S,T,Hkv,D] int8|dtype,
    k_scale, v_scale [S,T,Hkv] bf16)."""
    S, T = qp.shape[:2]
    Hq, Hkv, D = num_heads, num_kv_heads, head_dim
    dt = qp.dtype
    if q_norm_scale is None:
        q_norm_scale = jnp.ones((Hq, D), dt)
        q_norm_bias = jnp.zeros((Hq, D), dt)
        k_norm_scale = jnp.ones((Hkv, D), dt)
        k_norm_bias = jnp.zeros((Hkv, D), dt)

    kv_dt = jnp.int8 if quantize else dt
    kern = functools.partial(
        _epilogue_kernel, qk_norm=qk_norm, quantize=quantize, eps=eps
    )
    full = lambda *_: (0, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kern,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, T, Hq * D), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, T, Hkv * D), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, T, Hkv * D), lambda s: (s, 0, 0)),
            pl.BlockSpec((Hq, D), lambda s: (0, 0)),
            pl.BlockSpec((Hq, D), lambda s: (0, 0)),
            pl.BlockSpec((Hkv, D), lambda s: (0, 0)),
            pl.BlockSpec((Hkv, D), lambda s: (0, 0)),
            pl.BlockSpec((1, T, D), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, T, D), lambda s: (s, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, Hq, D), lambda s: (s, 0, 0, 0)),
            pl.BlockSpec((1, T, Hkv, D), lambda s: (s, 0, 0, 0)),
            pl.BlockSpec((1, T, Hkv, D), lambda s: (s, 0, 0, 0)),
            pl.BlockSpec((1, T, Hkv), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, T, Hkv), lambda s: (s, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, T, Hq, D), dt),
            jax.ShapeDtypeStruct((S, T, Hkv, D), kv_dt),
            jax.ShapeDtypeStruct((S, T, Hkv, D), kv_dt),
            jax.ShapeDtypeStruct((S, T, Hkv), jnp.bfloat16),
            jax.ShapeDtypeStruct((S, T, Hkv), jnp.bfloat16),
        ],
        interpret=interpret,
    )(qp, kp, vp, q_norm_scale, q_norm_bias, k_norm_scale, k_norm_bias,
      cos.astype(jnp.float32), sin.astype(jnp.float32))
    return tuple(out)
