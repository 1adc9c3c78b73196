"""Pallas TPU kernel: fused SJD windowed-decode attention over the static KV
cache (SURVEY.md §7 kernel (a)), flash-decoding formulation.

Design (v2 — the round-1 kernel lost to XLA because it relayouted the whole
cache head-major in HBM before every call; this one reads the cache in its
NATIVE [S, L, Hkv, D] row-major layout):

  * grid (S, L/chunk) with the chunk axis innermost/sequential; one grid step
    DMAs one contiguous [chunk, Hkv, D] block of K and V (int8), their
    per-row scales, and the validity slice;
  * online-softmax state (m, l, acc) lives in VMEM scratch across chunk
    steps — the accumulator rescale that made the XLA chunked path lose at
    W=16 (18.4 vs 15.3 ms) never touches HBM here;
  * chunks past the live edge (cache_end + window) are skipped: the compute
    is guarded by pl.when and the BlockSpec index_map clamps their block
    index to the last live chunk, so the pipeline re-uses the resident block
    instead of issuing a new DMA — per-step HBM traffic scales with the live
    prefix, not the buffer;
  * int8 KV dequantization (per-row scales) happens in VMEM; the prefix +
    window-causal + CFG-valid mask is pure index arithmetic (the reference
    materializes a growing [W, L] mask every step,
    jacobi_iteration_lumina_mgpt.py:816-846).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _flash_decode_kernel(
    cache_end_ref,  # SMEM [S] int32 (scalar prefetch)
    layer_ref,  # SMEM [1] int32 (scalar prefetch; selects the cache layer)
    q_ref,  # [1, Hkv, GW, D]
    k_ref,  # [1, 1, C, Hkv, D] int8 or compute dtype (one layer's chunk)
    v_ref,
    ks_ref,  # [1, 1, C, Hkv] bf16 (ones when not quantized)
    vs_ref,
    valid_ref,  # [1, C, 1] int8
    o_ref,  # [1, Hkv, GW, D]
    m_ref,  # scratch [Hkv, GW] f32
    l_ref,  # scratch [Hkv, GW] f32
    acc_ref,  # scratch [Hkv, GW, D] f32
    *,
    chunk: int,
    group: int,
    n_chunks: int,
):
    s = pl.program_id(0)
    c = pl.program_id(1)
    cache_end = cache_end_ref[s]
    Hkv, GW, D = q_ref.shape[1:]

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full((Hkv, GW), NEG_INF, jnp.float32)
        l_ref[...] = jnp.zeros((Hkv, GW), jnp.float32)
        acc_ref[...] = jnp.zeros((Hkv, GW, D), jnp.float32)

    # rows live in [0, cache_end + GW/group): the window is written at
    # cache_end before attention, so the last live chunk index is
    # (cache_end + window - 1) // chunk
    window = GW // group
    live = c * chunk < cache_end + window

    @pl.when(live)
    def _compute():
        # f32 compute throughout. A bf16-dot variant (keep bf16 queries at
        # the bf16 MXU rate, f32 accumulation) was tried and REVERTED: in a
        # standalone kernel microbenchmark it measured 15-20% faster, but in
        # the full 30-layer forward it cost ~+0.2 ms/layer (fwd 10.9 ->
        # 17.1 ms; 2026-08-19 A/B, PERF_NOTES "Per-step latency budget
        # (round 5)") — the bf16 [C,Hkv,D] transposes force packed-sublane
        # relayouts that Mosaic hides when the operands are already f32.
        q = q_ref[0].astype(jnp.float32)  # [Hkv, GW, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [C, Hkv, D]
        v = v_ref[0, 0].astype(jnp.float32)
        ks = ks_ref[0, 0].astype(jnp.float32)  # [C, Hkv]
        vs = vs_ref[0, 0].astype(jnp.float32)

        # batched per-head dot: [Hkv, GW, D] x [Hkv, C, D] -> [Hkv, GW, C]
        kh = k.transpose(1, 0, 2)
        s_hgc = jax.lax.dot_general(
            q, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s_hgc = s_hgc * (ks.T[:, None, :] / math.sqrt(D))

        col = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (Hkv, GW, chunk), 2)
        row = jax.lax.broadcasted_iota(jnp.int32, (Hkv, GW, chunk), 1)
        causal = col <= cache_end + row // group
        ok = valid_ref[0, :, 0].astype(jnp.int32)[None, None, :] > 0
        s_hgc = jnp.where(causal & ok, s_hgc, NEG_INF)

        m_prev, l_prev = m_ref[...], l_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s_hgc, axis=-1))
        p = jnp.exp(s_hgc - m_new[..., None])
        corr = jnp.exp(m_prev - m_new)
        l_ref[...] = l_prev * corr + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(
            p * vs.T[:, None, :], v.transpose(1, 0, 2),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hkv, GW, D]
        acc_ref[...] = acc_ref[...] * corr[..., None] + pv
        m_ref[...] = m_new

    @pl.when(c == n_chunks - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[...], 1e-37)[..., None]
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("window", "chunk", "interpret"),
)
def decode_attention(
    q: jnp.ndarray,  # [S, W, H, D]
    k_cache: jnp.ndarray,  # [S, L, Hkv, D] or FULL [S, NL, L, Hkv, D] (+layer)
    v_cache: jnp.ndarray,
    k_scale,  # [S, L, Hkv] / [S, NL, L, Hkv] bf16, or None
    v_scale,
    cache_end: jnp.ndarray,  # [S] int32
    valid: jnp.ndarray,  # [S, L] bool
    *,
    window: int,
    layer=None,  # int32 scalar selecting the layer of a 5-D stacked cache
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """``layer`` selects one layer of the full stacked cache INSIDE the
    kernel's BlockSpec index maps (scalar prefetch): the decode loop passes
    the whole [S, NL, L, Hkv, D] carry buffer and only the live chunks of
    that layer are ever DMA'd. The alternative — slicing the layer out with
    dynamic_index_in_dim before the call — materializes a full [S, L, Hkv, D]
    copy per layer per step because XLA cannot fuse a slice into a
    pallas_call operand (measured 3.2 ms/step at S=2, 12.8 at S=8 on the 7B
    768px config: the copy covers the whole buffer, fill-independent)."""
    S, W, H, D = q.shape
    # `window` is derivable from q and kept only as an API cross-check: a
    # mismatched value would desync the DMA-clamp index maps from the
    # kernel's internal live-edge mask (GW // group) — silent corruption
    assert window == W, (window, W)
    if cache_end.ndim == 0:
        cache_end = jnp.full((S,), cache_end, jnp.int32)
    if k_cache.ndim == 4:
        # single-layer caches become a 1-layer stack (free reshape)
        assert layer is None
        k_cache, v_cache = k_cache[:, None], v_cache[:, None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[:, None], v_scale[:, None]
        layer = 0
    assert layer is not None, "5-D stacked cache requires layer="
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    L, Hkv = k_cache.shape[2], k_cache.shape[3]
    group = H // Hkv
    chunk = min(chunk, L)
    if L % chunk:
        # fall back to the largest power-of-two chunk that divides L, else
        # the largest divisor of L within the requested chunk (the engine
        # pads its KV buffer to 512-multiples, engine.py, so this path only
        # serves ad-hoc probe/test lengths — a whole-buffer chunk at e.g.
        # L=2453 blows the ~16 MB scoped-VMEM limit)
        chunk = next(
            (c for c in (512, 256, 128, 64) if c < L and L % c == 0),
            max(d for d in range(1, min(chunk, L) + 1) if L % d == 0),
        )
    # Scoped-VMEM guard: ~3 live f32 score intermediates [Hkv, GW, chunk],
    # double-buffered K/V chunk DMAs, and the q/out/acc blocks must fit the
    # ~16 MB scoped limit; halve the chunk until the estimate fits 14 MB
    # (the 7B decode config W=16/Hkv=32/chunk=512 lands at ~12.5 MB and
    # keeps its measured-optimal chunk).
    gw_pad = (W * group + 7) // 8 * 8
    kvb = k_cache.dtype.itemsize
    while chunk > 64 and L % (chunk // 2) == 0 and (
        3 * Hkv * gw_pad * chunk * 4
        + 2 * 2 * chunk * Hkv * (D * kvb + 4)
        + Hkv * gw_pad * D * 12
    ) > 14 * 1024 * 1024:
        chunk //= 2
    n_chunks = L // chunk

    # [S, W, H, D] -> [S, Hkv, W*G, D] with row r = w*group + g (tiny relayout
    # of the window only; the CACHE is consumed in its native layout)
    qh = q.reshape(S, W, Hkv, group, D).transpose(0, 2, 1, 3, 4)
    qh = qh.reshape(S, Hkv, W * group, D)

    def _live_chunk(s, c, ce):
        # clamp dead chunks to the last live one: same block index ->
        # the pipeline skips the DMA re-fetch
        last_live = jnp.maximum((ce[s] + window - 1) // chunk, 0)
        return jnp.minimum(c, last_live)

    def chunk_map(s, c, ce, li):
        return (s, li[0], _live_chunk(s, c, ce), 0, 0)

    def scale_map_full(s, c, ce, li):
        return (s, li[0], _live_chunk(s, c, ce), 0)

    def valid_map(s, c, ce, li):
        return (s, _live_chunk(s, c, ce), 0)

    if k_scale is None:
        # bf16-cache path: the kernel still multiplies by per-row scales,
        # but a single all-ones CHUNK with a pinned block index serves every
        # grid step (constant index -> the pipeline never re-fetches), so no
        # [S, NL, L, Hkv] buffer is allocated or streamed per decode step
        k_scale = jnp.ones((S, 1, chunk, Hkv), jnp.bfloat16)
        v_scale = jnp.ones((S, 1, chunk, Hkv), jnp.bfloat16)
        scale_map = lambda s, c, ce, li: (s, 0, 0, 0)  # noqa: E731
    else:
        scale_map = scale_map_full

    out = pl.pallas_call(
        functools.partial(
            _flash_decode_kernel, chunk=chunk, group=group, n_chunks=n_chunks
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(S, n_chunks),
            in_specs=[
                pl.BlockSpec(
                    (1, Hkv, W * group, D), lambda s, c, ce, li: (s, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, 1, chunk, Hkv, D), chunk_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, chunk, Hkv, D), chunk_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, chunk, Hkv), scale_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, chunk, Hkv), scale_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chunk, 1), valid_map, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Hkv, W * group, D), lambda s, c, ce, li: (s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((Hkv, W * group), jnp.float32),
                pltpu.VMEM((Hkv, W * group), jnp.float32),
                pltpu.VMEM((Hkv, W * group, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((S, Hkv, W * group, D), q.dtype),
        interpret=interpret,
    )(
        cache_end.astype(jnp.int32),
        layer_arr,
        qh,
        k_cache,
        v_cache,
        k_scale,
        v_scale,
        valid.astype(jnp.int8)[:, :, None],
    )
    # [S, Hkv, W*G, D] -> [S, W, H, D]
    out = out.reshape(S, Hkv, W, group, D).transpose(0, 2, 1, 3, 4)
    return out.reshape(S, W, H, D)


def decode_attention_tp(
    q, k_cache, v_cache, k_scale, v_scale, cache_end, valid,
    *, window: int, layer=None, axis: str = "model", mesh=None,
    chunk: int = 512, interpret: bool = False,
):
    """Tensor-parallel wrapper: attention is head-parallel, so each TP rank
    runs the flash-decode kernel on its own head shard with NO collectives —
    the shard_map escape hatch GSPMD needs around pallas_call. ``mesh``
    defaults to the ambient mesh (jax.set_mesh). Sharding contract matches
    parallel/sharding.py: q heads and KV heads split on ``axis``; cache_end
    and valid replicated. Accepts the same 4-D per-layer or 5-D
    stacked-cache (+``layer``) operands as :func:`decode_attention`."""
    from jax.sharding import PartitionSpec as P

    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()

    hs = P(None, None, axis, None)
    stacked = k_cache.ndim == 5
    cs = P(None, None, None, axis, None) if stacked else hs
    ss = P(None, None, None, axis) if stacked else P(None, None, axis)
    quantized = k_scale is not None
    if layer is None:
        layer_arr = None
    else:
        layer_arr = jnp.asarray(layer, jnp.int32)

    if quantized:
        def local(q, k, v, ks, vs, ce, vd, li):
            return decode_attention(
                q, k, v, ks, vs, ce, vd, window=window,
                layer=li if stacked else None, chunk=chunk,
                interpret=interpret)

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(hs, cs, cs, ss, ss, P(), P(), P()),
            out_specs=hs, check_vma=False,
        )(q, k_cache, v_cache, k_scale, v_scale, cache_end, valid,
          jnp.zeros((), jnp.int32) if layer_arr is None else layer_arr)

    def local(q, k, v, ce, vd, li):
        return decode_attention(
            q, k, v, None, None, ce, vd, window=window,
            layer=li if stacked else None, chunk=chunk, interpret=interpret)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(hs, cs, cs, P(), P(), P()),
        out_specs=hs, check_vma=False,
    )(q, k_cache, v_cache, cache_end, valid,
      jnp.zeros((), jnp.int32) if layer_arr is None else layer_arr)
