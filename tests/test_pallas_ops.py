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
