"""HBM bandwidth ceiling probe for the int4 weight-read floor (verdict r4 #3).

The flagship decode step is weight-read bound: ~3.2 GB of packed s4
projections + 0.27 GB int8 head are streamed from HBM every forward. This
probe measures, on the real chip:

  stream_s8_gbps    pure HBM read ceiling: sum-reduce a multi-GB int8
                    buffer (no unpack work; XLA fuses convert-into-reduce)
  stream_s4_gbps    same over an s4 buffer — isolates the VPU nibble-unpack
                    tax relative to s8 at equal BYTES read
  dot_s4_gbps       the production pattern: [32, K] bf16 activations x
                    dequantized s4 weights (dot_general with scale epilogue),
                    the exact shape mix of quantize_weights/persist_int4
  dot_s8_gbps       same matmul chain with s8 weights (half the param count
                    at equal bytes, so BW is comparable byte-for-byte)

If stream_s4 >> dot_s4, a hand-written Pallas matmul that streams packed
nibbles has headroom and is worth (re)attempting; if they match, the XLA s4
dot is already at the memory-system ceiling and the measured floor stands
as the hardware bound (PERF_NOTES "Per-step latency budget").

Prints one JSON dict. Run alone on the chip (benches are serialized).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def _time_chained(fn, x, iters=20):
    """Chain through a scalar data dependency so neither XLA loop folding
    nor async-dispatch queueing hides the per-iteration cost."""
    acc = jnp.float32(0.0)
    acc = fn(x, acc)
    _fetch(acc)
    t0 = time.time()
    for _ in range(iters):
        acc = fn(x, acc)
    _fetch(acc)
    return (time.time() - t0) / iters


def main():
    # s4 arrays crossing a jit boundary need the layout-metadata workaround
    # on this backend (utils/subbyte_io.py — the "Recursively calling jit"
    # bug), exactly as the production decode stack installs it
    from sjd_tpu.utils.subbyte_io import install_subbyte_layout_workaround

    install_subbyte_layout_workaround()
    out = {}
    # context row: raw HBM read ceiling with no unpack work — a bf16
    # sum-reduce (convert-to-f32 is one VPU op per element, the cheapest
    # full-rate read XLA will express). Separates "memory system" from
    # "nibble unpack" in the s4/s8 rows below.
    wb = jax.random.normal(jax.random.PRNGKey(1), (96, 4096, 4096),
                           jnp.bfloat16)  # 3.2 GB
    jax.block_until_ready(wb)

    @jax.jit
    def stream_bf16(w, acc):
        return acc + jnp.sum(w.astype(jnp.float32)) * 1e-9

    t = _time_chained(stream_bf16, wb, iters=10)
    out["stream_bf16_gbps"] = round(wb.nbytes / t / 1e9, 1)
    out["stream_bf16_ms"] = round(t * 1e3, 2)
    del wb

    # ~3.2 GB of payload, mirroring the 7B int4 projection mass
    K, N = 4096, 8192
    blocks = 96  # 96 x 4096 x 8192 = 3.2e9 weights
    nbytes_s4 = blocks * K * N // 2
    nbytes_s8 = blocks * K * N

    key = jax.random.PRNGKey(0)
    w4 = jax.random.randint(key, (blocks, K, N), -7, 8, jnp.int8).astype(
        jnp.int4
    )
    jax.block_until_ready(w4)

    @jax.jit
    def stream4(w, acc):
        # convert fused into the reduce; traffic = the packed s4 bytes
        return acc + jnp.sum(w.astype(jnp.int32)) * 1e-9

    t = _time_chained(stream4, w4, iters=10)
    out["stream_s4_gbps"] = round(nbytes_s4 / t / 1e9, 1)
    out["stream_s4_ms"] = round(t * 1e3, 2)

    # production dot: [32, K] bf16 x s4 [N, K] (weights stored out-major like
    # quantize_weights), scale epilogue, chained through the activation
    x0 = jnp.ones((32, K), jnp.bfloat16)
    w4d = w4.reshape(blocks, K, N).transpose(0, 2, 1)  # [blocks, N, K]
    w4d = jax.device_put(w4d)
    scales = jnp.ones((blocks, N), jnp.bfloat16)
    jax.block_until_ready((w4d, scales))

    @jax.jit
    def dot4(wd, acc):
        def body(c, inp):
            w, s = inp
            y = jax.lax.dot_general(
                x0, w.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s[None, :].astype(jnp.float32)
            return c + jnp.sum(y) * 1e-9, None

        c, _ = jax.lax.scan(body, acc, (wd, scales))
        return c

    t = _time_chained(dot4, w4d, iters=10)
    out["dot_s4_gbps"] = round(nbytes_s4 / t / 1e9, 1)
    out["dot_s4_ms"] = round(t * 1e3, 2)

    del w4, w4d
    w8 = jax.random.randint(key, (blocks // 2, K, N), -127, 128, jnp.int8)
    jax.block_until_ready(w8)

    @jax.jit
    def stream8(w, acc):
        return acc + jnp.sum(w.astype(jnp.int32)) * 1e-9

    t = _time_chained(stream8, w8, iters=10)
    out["stream_s8_gbps"] = round(nbytes_s8 // 2 / t / 1e9, 1)
    out["stream_s8_ms_half"] = round(t * 1e3, 2)

    w8d = w8.transpose(0, 2, 1)
    scales8 = jnp.ones((blocks // 2, N), jnp.bfloat16)
    jax.block_until_ready(w8d)

    @jax.jit
    def dot8(wd, acc):
        def body(c, inp):
            w, s = inp
            y = jax.lax.dot_general(
                x0, w.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s[None, :].astype(jnp.float32)
            return c + jnp.sum(y) * 1e-9, None

        c, _ = jax.lax.scan(body, acc, (wd, scales8))
        return c

    t = _time_chained(dot8, w8d, iters=10)
    out["dot_s8_gbps"] = round(nbytes_s8 // 2 / t / 1e9, 1)
    out["dot_s8_ms_half"] = round(t * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
