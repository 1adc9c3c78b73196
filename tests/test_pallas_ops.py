"""Pallas kernel correctness vs the XLA reference path (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from sjd_tpu.ops.decode_attention import decode_attention


def _reference_attn(q, k, v, cache_end, valid, window):
    """Mirror of transformer._attend + _decode_masks in plain numpy-ish jax."""
    S, W, H, D = q.shape
    L, Hkv = k.shape[1], k.shape[2]
    group = H // Hkv
    j = jnp.arange(L)[None, None, :]
    i = jnp.arange(W)[None, :, None]
    ce = cache_end[:, None, None]
    mask = (j <= ce + i) & valid[:, None, :]
    qg = q.reshape(S, W, Hkv, group, D)
    scores = jnp.einsum("swhgd,slhd->shgwl", qg.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(D)
    scores = jnp.where(mask[:, None, None, :, :], scores, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("shgwl,slhd->swhgd", p, v.astype(jnp.float32))
    return out.reshape(S, W, H, D)


def test_decode_attention_matches_reference_fp():
    S, W, H, Hkv, D, L = 2, 4, 4, 2, 8, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (S, W, H, D), jnp.float32)
    k = jax.random.normal(kk, (S, L, Hkv, D), jnp.float32)
    v = jax.random.normal(kv_, (S, L, Hkv, D), jnp.float32)
    cache_end = jnp.asarray([10, 20], jnp.int32)
    valid = jnp.ones((S, L), bool).at[1, :5].set(False)

    got = decode_attention(q, k, v, None, None, cache_end, valid,
                           window=W, interpret=True)
    want = _reference_attn(q, k, v, cache_end, valid, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_decode_attention_int8_close_to_fp():
    from sjd_tpu.models.transformer import _quantize_rows

    S, W, H, Hkv, D, L = 1, 4, 4, 4, 8, 32
    key = jax.random.PRNGKey(1)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (S, W, H, D), jnp.float32)
    k = jax.random.normal(kk, (S, L, Hkv, D), jnp.float32)
    v = jax.random.normal(kv_, (S, L, Hkv, D), jnp.float32)
    kq8, ks = _quantize_rows(k)
    vq8, vs = _quantize_rows(v)
    cache_end = jnp.asarray([16], jnp.int32)
    valid = jnp.ones((S, L), bool)

    got = decode_attention(q, kq8, vq8, ks, vs, cache_end, valid,
                           window=W, interpret=True)
    want = _reference_attn(q, k, v, cache_end, valid, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0.05, atol=0.05)


def test_decode_attention_bf16_int8_close_to_fp():
    """Production dtype mix (bf16 queries + int8 cache): the kernel keeps the
    dots in bf16 at the MXU rate (f32 accumulation). int8 cache values are
    exact in bf16, so only the PV softmax-prob operand rounds — output must
    stay within quant-noise tolerance of the full-f32 reference."""
    from sjd_tpu.models.transformer import _quantize_rows

    S, W, H, Hkv, D, L = 2, 4, 8, 4, 16, 64
    key = jax.random.PRNGKey(11)
    kq, kk, kv_ = jax.random.split(key, 3)
    q32 = jax.random.normal(kq, (S, W, H, D), jnp.float32)
    k = jax.random.normal(kk, (S, L, Hkv, D), jnp.float32)
    v = jax.random.normal(kv_, (S, L, Hkv, D), jnp.float32)
    kq8, ks = _quantize_rows(k)
    vq8, vs = _quantize_rows(v)
    cache_end = jnp.asarray([12, 33], jnp.int32)
    valid = jnp.ones((S, L), bool).at[1, :4].set(False)

    q = q32.astype(jnp.bfloat16)
    got = decode_attention(q, kq8, vq8, ks, vs, cache_end, valid,
                           window=W, chunk=16, interpret=True)
    want = _reference_attn(q.astype(jnp.float32), k, v, cache_end, valid, W)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.06, atol=0.06)


def test_decode_attention_multichunk_matches_reference():
    """Multi-chunk flash path with a live edge mid-buffer: online-softmax
    merge + dead-chunk skipping must still be exact."""
    S, W, H, Hkv, D, L = 2, 4, 8, 2, 8, 64
    key = jax.random.PRNGKey(3)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (S, W, H, D), jnp.float32)
    k = jax.random.normal(kk, (S, L, Hkv, D), jnp.float32)
    v = jax.random.normal(kv_, (S, L, Hkv, D), jnp.float32)
    cache_end = jnp.asarray([9, 37], jnp.int32)  # live edges inside chunks
    valid = jnp.ones((S, L), bool).at[0, :3].set(False)

    got = decode_attention(q, k, v, None, None, cache_end, valid,
                           window=W, chunk=16, interpret=True)
    want = _reference_attn(q, k, v, cache_end, valid, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_decode_attention_tp_matches_local():
    """shard_map-wrapped kernel over a 2-way model axis (head-parallel, no
    collectives) must equal the unsharded kernel — the multi-chip TP serving
    path (attn_impl='pallas_tp')."""
    from jax.sharding import Mesh

    from sjd_tpu.ops.decode_attention import decode_attention_tp

    S, W, H, Hkv, D, L = 2, 4, 8, 4, 8, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (S, W, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (S, L, Hkv, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (S, L, Hkv, D), jnp.float32)
    ce = jnp.asarray([10, 30], jnp.int32)
    valid = jnp.ones((S, L), bool)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("model",))

    got = decode_attention_tp(q, k, v, None, None, ce, valid, window=W,
                              mesh=mesh, chunk=16, interpret=True)
    want = decode_attention(q, k, v, None, None, ce, valid, window=W,
                            chunk=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # quantized path too
    from sjd_tpu.models.transformer import _quantize_rows

    kq, ks = _quantize_rows(k)
    vq, vs = _quantize_rows(v)
    got_q = decode_attention_tp(q, kq, vq, ks, vs, ce, valid, window=W,
                                mesh=mesh, chunk=16, interpret=True)
    want_q = decode_attention(q, kq, vq, ks, vs, ce, valid, window=W,
                              chunk=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(want_q),
                               rtol=2e-5, atol=2e-5)


def test_decode_attention_int8_gqa_close_to_fp():
    """int8 dequant under GQA (group > 1): the per-row scale broadcasts over
    the [Hkv, GW, C] score layout where GW interleaves window x group — a
    wrong-axis broadcast would cancel in kernel-vs-kernel comparisons and
    only shows against the fp reference."""
    from sjd_tpu.models.transformer import _quantize_rows

    S, W, H, Hkv, D, L = 2, 4, 8, 2, 8, 32  # group = 4
    key = jax.random.PRNGKey(7)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (S, W, H, D), jnp.float32)
    k = jax.random.normal(kk, (S, L, Hkv, D), jnp.float32)
    v = jax.random.normal(kv_, (S, L, Hkv, D), jnp.float32)
    kq8, ks = _quantize_rows(k)
    vq8, vs = _quantize_rows(v)
    cache_end = jnp.asarray([7, 19], jnp.int32)
    valid = jnp.ones((S, L), bool)

    got = decode_attention(q, kq8, vq8, ks, vs, cache_end, valid,
                           window=W, interpret=True)
    want = _reference_attn(q, k, v, cache_end, valid, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)


# ---------------------------------------------------------------------------
# fused layer epilogue (qk-norm + rope + KV int8 quantize)
# ---------------------------------------------------------------------------


def _unfused_epilogue(qp, kp, vp, qns, qnb, kns, knb, cos, sin, H, Hkv, D,
                      qk_norm, quantize, eps=1e-5):
    from sjd_tpu.models.transformer import (
        _quantize_rows,
        apply_rope,
        head_layer_norm,
    )

    S, T = qp.shape[:2]
    q = qp.reshape(S, T, H, D)
    k = kp.reshape(S, T, Hkv, D)
    v = vp.reshape(S, T, Hkv, D)
    if qk_norm:
        q = head_layer_norm(q, qns, qnb, eps)
        k = head_layer_norm(k, kns, knb, eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if quantize:
        kq, ks = _quantize_rows(k)
        vq, vs = _quantize_rows(v)
        return q, kq, vq, ks, vs
    return q, k, v, None, None


import pytest


@pytest.mark.parametrize("qk_norm,quantize", [
    (True, True), (True, False), (False, True), (False, False),
])
def test_fused_epilogue_bit_matches_unfused(qk_norm, quantize):
    from sjd_tpu.ops.fused_epilogue import fused_epilogue

    S, T, H, Hkv, D = 2, 4, 4, 2, 8
    key = jax.random.PRNGKey(3)
    ks_ = jax.random.split(key, 8)
    dt = jnp.float32
    qp = jax.random.normal(ks_[0], (S, T, H * D), dt)
    kp = jax.random.normal(ks_[1], (S, T, Hkv * D), dt)
    vp = jax.random.normal(ks_[2], (S, T, Hkv * D), dt) * 3.0
    qns = 1.0 + 0.1 * jax.random.normal(ks_[3], (H, D), dt)
    qnb = 0.1 * jax.random.normal(ks_[4], (H, D), dt)
    kns = 1.0 + 0.1 * jax.random.normal(ks_[5], (Hkv, D), dt)
    knb = 0.1 * jax.random.normal(ks_[6], (Hkv, D), dt)
    ang = jax.random.uniform(ks_[7], (S, T, D), jnp.float32, 0, 3.0)
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    got = fused_epilogue(
        qp, kp, vp,
        qns if qk_norm else None, qnb if qk_norm else None,
        kns if qk_norm else None, knb if qk_norm else None,
        cos, sin, num_heads=H, num_kv_heads=Hkv, head_dim=D,
        qk_norm=qk_norm, quantize=quantize, interpret=True,
    )
    want = _unfused_epilogue(qp, kp, vp, qns, qnb, kns, knb, cos, sin,
                             H, Hkv, D, qk_norm, quantize)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-6, atol=1e-6)  # q
    if quantize:
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
        np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))
        np.testing.assert_allclose(np.asarray(got[3], np.float32),
                                   np.asarray(want[3], np.float32),
                                   rtol=1e-2)
        np.testing.assert_allclose(np.asarray(got[4], np.float32),
                                   np.asarray(want[4], np.float32),
                                   rtol=1e-2)
    else:
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                                   rtol=1e-6, atol=1e-6)


def test_fused_epilogue_bf16_matches_unfused():
    """bf16 compute dtype (production) — the cast points inside the kernel
    mirror the unfused chain, so outputs are bit-identical."""
    from sjd_tpu.ops.fused_epilogue import fused_epilogue

    S, T, H, Hkv, D = 1, 4, 2, 2, 8
    key = jax.random.PRNGKey(9)
    ks_ = jax.random.split(key, 4)
    qp = jax.random.normal(ks_[0], (S, T, H * D), jnp.bfloat16)
    kp = jax.random.normal(ks_[1], (S, T, Hkv * D), jnp.bfloat16)
    vp = jax.random.normal(ks_[2], (S, T, Hkv * D), jnp.bfloat16)
    qns = jnp.ones((H, D), jnp.bfloat16)
    qnb = jnp.zeros((H, D), jnp.bfloat16)
    ang = jax.random.uniform(ks_[3], (S, T, D), jnp.float32, 0, 3.0)
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    got = fused_epilogue(qp, kp, vp, qns, qnb, qns, qnb, cos, sin,
                         num_heads=H, num_kv_heads=Hkv, head_dim=D,
                         qk_norm=True, quantize=True, interpret=True)
    want = _unfused_epilogue(qp, kp, vp, qns, qnb, qns, qnb, cos, sin,
                             H, Hkv, D, True, True)
    np.testing.assert_array_equal(
        np.asarray(got[0], np.float32), np.asarray(want[0], np.float32))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))


def test_decode_attention_stacked_layer_select():
    """5-D stacked-cache path (layer chosen in the BlockSpec index maps via
    scalar prefetch) is bit-identical to slicing the layer out host-side and
    using the 4-D path — for every layer, quantized and not."""
    from sjd_tpu.models.transformer import _quantize_rows

    S, W, H, Hkv, D, L, NL = 2, 4, 4, 2, 8, 64, 3
    key = jax.random.PRNGKey(7)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (S, W, H, D), jnp.float32)
    k = jax.random.normal(kk, (S, NL, L, Hkv, D), jnp.float32)
    v = jax.random.normal(kv_, (S, NL, L, Hkv, D), jnp.float32)
    cache_end = jnp.asarray([10, 40], jnp.int32)
    valid = jnp.ones((S, L), bool).at[0, :3].set(False)

    for li in range(NL):
        got = decode_attention(q, k, v, None, None, cache_end, valid,
                               window=W, layer=li, interpret=True)
        want = decode_attention(q, k[:, li], v[:, li], None, None,
                                cache_end, valid, window=W, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    kq8, ks = _quantize_rows(k)
    vq8, vs = _quantize_rows(v)
    li = jnp.asarray(1, jnp.int32)  # traced-scalar layer index, like the scan
    got = decode_attention(q, kq8, vq8, ks, vs, cache_end, valid,
                           window=W, layer=li, interpret=True)
    want = decode_attention(q, kq8[:, 1], vq8[:, 1], ks[:, 1], vs[:, 1],
                            cache_end, valid, window=W, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_decode_attention_odd_buffer_length_divisor_fallback():
    """L with no power-of-two divisor (e.g. 1100 = 4x275) must fall back to
    the largest divisor within the requested chunk rather than a whole-buffer
    chunk — a whole-L block at production lengths (2453) exceeds the ~16 MB
    scoped-VMEM limit (round-5 latency_budget crash)."""
    S, W, H, Hkv, D, L = 1, 4, 4, 2, 8, 1100
    key = jax.random.PRNGKey(7)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (S, W, H, D), jnp.float32)
    k = jax.random.normal(kk, (S, L, Hkv, D), jnp.float32)
    v = jax.random.normal(kv_, (S, L, Hkv, D), jnp.float32)
    cache_end = jnp.asarray([700], jnp.int32)
    valid = jnp.ones((S, L), bool).at[0, :9].set(False)

    got = decode_attention(q, k, v, None, None, cache_end, valid,
                           window=W, interpret=True)
    want = _reference_attn(q, k, v, cache_end, valid, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
