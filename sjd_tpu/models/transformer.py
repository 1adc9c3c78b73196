"""Generic TPU-native decoder-only transformer with a static KV cache.

One parametric decoder covers every backbone in the reference repo:

  * Chameleon / Lumina-mGPT-7B  — per-head qk layer-norm, MHA, 1-D RoPE
    (reference: lumina_mgpt/model/chameleon/modeling_chameleon.py:198-592)
  * Emu3-8B                      — GQA (8 kv heads), rope_theta=1e6
    (reference: emu3/mllm/modeling_emu3.py)
  * LlamaGen GPT-B..3B           — 2-D RoPE over the token grid, fused qkv
    (reference: llamagen/llamagen.py:441-455, 203-219)
  * Anole (HF Chameleon port)    — same as Chameleon.

TPU-first design decisions:
  * Stacked layer parameters + `lax.scan` over layers: one compiled layer
    body, fast compile, natural sharding of the `[n_layers, ...]` leading dim.
  * Static `[S, L_buf, H_kv, D]` KV buffers written in place at a per-sample
    dynamic offset; "rollback" after speculative rejection is a no-op (the
    next window overwrites the rejected rows), unlike the reference's
    per-layer tensor truncation (jacobi_iteration_lumina_mgpt.py:47-54).
  * Per-sample position ids derived from a per-sample valid-prefix mask so
    CFG prompt-masking (jacobi_iteration_lumina_mgpt.py:755-760) needs no
    separate code path.
  * All matmuls in bf16 on the MXU with fp32 accumulation; softmax and
    logits in fp32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

PyTree = Any


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Shape/arch hyperparameters for the generic decoder."""

    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rope_theta: float = 10000.0
    # "1d": standard LLaMA RoPE on position ids.
    # "2d": LlamaGen grid RoPE (half the rotary dims encode row, half column;
    #        reference llamagen/llamagen.py:441-455). The table is precomputed
    #        per absolute position, so apply-side code is shared.
    rope_style: str = "1d"
    # Chameleon qk-norm: LayerNorm over head_dim (no affine in the stats) with
    # per-head gamma/beta (reference modeling_chameleon.py:198-221, 270-275).
    qk_norm: bool = False
    qk_norm_eps: float = 1e-5
    # Chameleon `swin_norm=True` variant normalizes sublayer *outputs*
    # (reference modeling_chameleon.py:669-760); False = pre-norm (LLaMA).
    swin_norm: bool = False
    # int8 KV cache with per-(position, head) scales: halves KV memory and
    # decode-step HBM reads (needed to fit 7B + 768px CFG on one v5e chip).
    kv_quant: bool = False
    # How int8 weights multiply activations:
    #   "int8" — W8A8: dynamic per-token int8 activations, int8xint8->int32
    #            on the MXU (one shared quantization per input tensor).
    #   "bf16" — W8A16: bf16 activations against int8 weights with the
    #            int8->bf16 convert fused into the MXU operand read; weight
    #            HBM traffic is identical, no activation-quant chain at all.
    # Default bf16: measured equal-or-faster than int8 on the v5e decode
    # step (15.28 vs 15.53 ms/forward, 7B CFG) with strictly better numerics
    # (no activation quantization error) — decode is bandwidth-bound, so the
    # MXU's 2x int8 throughput never comes into play at these batch sizes.
    act_quant: str = "bf16"
    # Live-prefix chunked (flash-decoding) attention row-chunk size; 0 =
    # monolithic full-buffer attention. Measured v5e 7B CFG, 2560-row cache,
    # 1200 live rows: chunked wins for narrow windows (T=1: 14.7 vs 17.1 ms)
    # but LOSES for the default W=16 step (18.4 vs 15.3 ms — the online-
    # softmax accumulator rescale traffic scales with T), so monolithic is
    # the default for the SJD decode; enable for 1-token AR serving or very
    # long caches.
    attn_buckets: int = 0
    # "xla" = einsum attention with an explicit mask; "pallas" = the fused
    # flash-decoding kernel (ops/decode_attention.py) — native-layout chunked
    # cache reads, VMEM online-softmax state, dead-chunk DMA skipping; beats
    # the XLA path at every cache fill on v5e (13.0/15.1/16.5 vs
    # 16.5/16.5/17.5 ms/forward at 150/1200/2400 live rows, 7B CFG W=16).
    # "auto" (default) = pallas for single-chip TPU decode windows, xla
    # elsewhere. "pallas_tp" = the kernel under shard_map over the ambient
    # mesh's 'model' axis (attention is head-parallel, no collectives) — the
    # explicit opt-in for multi-chip TP serving, since pallas_call is not
    # GSPMD-partitionable on its own.
    attn_impl: str = "auto"
    norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    # Emu3 applies dropout to embeddings at train time
    # (emu3/mllm/modeling_emu3.py:1050); inference ignores it.
    dtype: Any = jnp.bfloat16
    # 2d rope grid parameters (LlamaGen): number of conditioning positions
    # preceding the image grid and the grid side length.
    rope_2d_cls_len: int = 120
    rope_2d_grid_side: int = 32
    max_position_embeddings: int = 16384

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


class KVCache(NamedTuple):
    """Preallocated per-layer KV buffers.

    k, v: [S, num_layers, L_buf, H_kv, D] in the model compute dtype, or int8
    with per-(position, head) scales when ``DecoderConfig.kv_quant`` is set —
    (row-major position layout: the window write is one contiguous
    [T, H_kv, D] block per sample, which measures ~20%% faster per decode
    step than a head-major layout on v5e) — halving at-rest KV memory and
    the HBM read bandwidth of every decode step
    (the usual TPU serving bottleneck).
    Axis order: SAMPLE-major, then layer. The decode loop's per-layer
    scatter (write_kv_layer's vmap over samples) makes XLA prefer an
    S-outermost physical layout for the while-loop carry; with a
    [layers, S, ...] logical order that preference forced 2 x 2.5 GB
    transpose copies whenever the cache crossed a jit boundary in default
    layout (resume/refill — an OOM at the 768px CFG B=4 config). S-major
    logical order makes the default layout AND the carry layout identical.
    The live region of sample ``s`` is ``[0, cache_end[s])``; rows past the
    end are garbage that the next window write overwrites. There is no
    rollback operation — this is the TPU replacement for the reference's
    `delete_false_key_value` truncation.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None  # [S, layers, L_buf, H_kv] bf16
    v_scale: Optional[jnp.ndarray] = None

    @property
    def buf_len(self) -> int:
        return self.k.shape[2]


def init_kv_cache(cfg: DecoderConfig, batch: int, buf_len: int) -> KVCache:
    shape = (batch, cfg.num_layers, buf_len, cfg.num_kv_heads, cfg.head_dim)
    if cfg.kv_quant:
        sshape = shape[:-1]
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(sshape, jnp.bfloat16),
            v_scale=jnp.zeros(sshape, jnp.bfloat16),
        )
    return KVCache(k=jnp.zeros(shape, cfg.dtype), v=jnp.zeros(shape, cfg.dtype))


def _quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 per-(position, head) quantization over head_dim."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# RoPE tables
# ---------------------------------------------------------------------------


def rope_table_1d(cfg: DecoderConfig, max_pos: int) -> jnp.ndarray:
    """[max_pos, 2, head_dim] (cos, sin) table, LLaMA split-half convention."""
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [P, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [P, D]
    return jnp.stack([jnp.cos(emb), jnp.sin(emb)], axis=1)  # [P, 2, D]


def rope_table_2d(cfg: DecoderConfig, max_pos: int) -> jnp.ndarray:
    """LlamaGen-style 2-D grid RoPE flattened to an absolute-position table.

    Positions [0, cls_len) are conditioning tokens (zero rotation — LlamaGen
    precomputes a zero-angle block for the class/caption prefix, reference
    llamagen/llamagen.py:447-452); positions beyond map row-major onto a
    (side x side) grid, with the first half of the rotary dims encoding the
    row index and the second half the column index.
    """
    quarter = cfg.head_dim // 4
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, quarter, dtype=jnp.float32) / quarter)
    )
    pos = jnp.arange(max_pos, dtype=jnp.int32)
    grid_pos = jnp.maximum(pos - cfg.rope_2d_cls_len, 0)
    row = (grid_pos // cfg.rope_2d_grid_side).astype(jnp.float32)
    col = (grid_pos % cfg.rope_2d_grid_side).astype(jnp.float32)
    in_grid = (pos >= cfg.rope_2d_cls_len).astype(jnp.float32)[:, None]
    f_row = row[:, None] * inv_freq[None, :] * in_grid  # [P, quarter]
    f_col = col[:, None] * inv_freq[None, :] * in_grid
    # split-half convention over the full head_dim: [row, col, row, col]
    half = jnp.concatenate([f_row, f_col], axis=-1)  # [P, D/2]
    emb = jnp.concatenate([half, half], axis=-1)  # [P, D]
    return jnp.stack([jnp.cos(emb), jnp.sin(emb)], axis=1)


def make_rope_table(cfg: DecoderConfig, max_pos: Optional[int] = None) -> jnp.ndarray:
    max_pos = max_pos or cfg.max_position_embeddings
    if cfg.rope_style == "2d":
        return rope_table_2d(cfg, max_pos)
    if cfg.rope_style == "1d":
        return rope_table_1d(cfg, max_pos)
    raise ValueError(f"unknown rope_style {cfg.rope_style!r}")


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [S, T, H, D]; cos/sin: [S, T, D]."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return (x * cos + _rotate_half(x) * sin).astype(x.dtype)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: DecoderConfig) -> PyTree:
    """Random-init parameters (weight porting fills these from checkpoints)."""

    def dense(key, fan_in, shape):
        scale = 1.0 / math.sqrt(fan_in)
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(cfg.dtype)

    keys = jax.random.split(rng, 10)
    n, d, i = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    layers = {
        "attn_norm": jnp.ones((n, d), cfg.dtype),
        # weights are stored torch-style [layer, out, in] and contracted on
        # the LAST axis: this is the layout XLA prefers for scanned matmuls
        # on TPU (avoids 1GB/tensor relayout copies of the 7B weights) and
        # makes checkpoint porting transpose-free.
        "wq": dense(keys[0], d, (n, cfg.q_dim, d)),
        "wk": dense(keys[1], d, (n, cfg.kv_dim, d)),
        "wv": dense(keys[2], d, (n, cfg.kv_dim, d)),
        "wo": dense(keys[3], cfg.q_dim, (n, d, cfg.q_dim)),
        "mlp_norm": jnp.ones((n, d), cfg.dtype),
        "w_gate": dense(keys[4], d, (n, i, d)),
        "w_up": dense(keys[5], d, (n, i, d)),
        "w_down": dense(keys[6], i, (n, d, i)),
    }
    if cfg.qk_norm:
        layers["q_norm_scale"] = jnp.ones((n, cfg.num_heads, cfg.head_dim), cfg.dtype)
        layers["q_norm_bias"] = jnp.zeros((n, cfg.num_heads, cfg.head_dim), cfg.dtype)
        layers["k_norm_scale"] = jnp.ones(
            (n, cfg.num_kv_heads, cfg.head_dim), cfg.dtype
        )
        layers["k_norm_bias"] = jnp.zeros(
            (n, cfg.num_kv_heads, cfg.head_dim), cfg.dtype
        )
    params = {
        "embed": dense(keys[7], d, (cfg.vocab_size, d)),
        "layers": layers,
        "final_norm": jnp.ones((d,), cfg.dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(keys[8], d, (cfg.vocab_size, d))
    return params


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------


def _quantize_act(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric per-token int8 activation quantization."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def _dot_last(x: jnp.ndarray, w: jnp.ndarray, out_dtype) -> jnp.ndarray:
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=out_dtype,
    )


def linear(x: jnp.ndarray, w, act_quant: str = "bf16") -> jnp.ndarray:
    """x [..., in] @ w [out, in] -> [..., out] (torch weight layout).

    ``w`` may be a quantized dict {"q": int8 [out, in], "s": f32 [out]}
    (see quantize_weights). act_quant picks the multiply: "int8" quantizes
    the activations per token and runs int8 x int8 -> int32 on the MXU
    (W8A8); "bf16" feeds bf16 activations against the int8 weights with the
    convert fused into the operand read (W8A16) — same weight HBM traffic,
    no activation-quant chain.
    """
    if isinstance(w, dict):
        return linear_multi(x, (w,), act_quant)[0]
    return _dot_last(x, w, x.dtype)


def unpack_int4(q4p: jnp.ndarray) -> jnp.ndarray:
    """[..., O, K/2] packed uint8 -> [..., O, K] int8 values in [-8, 7].

    Split-half nibble layout (see quantize_weights bits=4): byte column j
    holds weight column j in its LOW nibble and column j + K/2 in its HIGH
    nibble, so unpacking is two arithmetic shifts and one lane-contiguous
    concatenate (no interleave relayout).
    """
    i8 = q4p.astype(jnp.int8)
    four = jnp.int8(4)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(i8, four), four)
    hi = jax.lax.shift_right_arithmetic(i8, four)
    return jnp.concatenate([lo, hi], axis=-1)


def unpack_int4_params(params: PyTree) -> PyTree:
    """Unpack every {"q4p": uint8, "s"} leaf-dict to {"q": s4, "s"}.

    MUST run on the STACKED [n_layers, O, K/2] arrays BEFORE the layer scan:
    the unpack chain is then invariant w.r.t. the decode while_loop, XLA
    hoists it, and every step reads packed s4 storage at half the int8 HBM
    traffic with the s4 -> bf16 convert fused into the MXU operand read
    (measured 4.3 ms/forward vs int8's 6.3 on the v5e 7B decode matmul
    load). Unpacking per-layer inside the scan body instead re-executes on
    every forward (scan xs slices cannot be hoisted) and measured SLOWER
    than int8 (16.2 ms).

    Design notes (all measured — PERF_NOTES.md — do not redo blindly):
    group-wise scales cannot ride the one-dot structure (an XLA sub-dot per
    group round-trips [Kg, M, O] fp32 partials through HBM: 9.7 ms), and a
    Pallas kernel over the packed bytes bottoms out at 5.4 ms even with NO
    nibble extraction (in-VMEM extraction costs ~4 ms more: Mosaic has no
    sub-word vector shifts, nibbles widen to i32 lane-by-lane). Per-channel
    scales + the exact column equilibration of equilibrate_for_int4 (folded
    into adjacent params at quantization time, zero runtime cost) is the
    accuracy-bearing substitute.
    """

    def is_q(t):
        return isinstance(t, dict) and "q4p" in t

    def unp(t):
        if is_q(t):
            return {"q": unpack_int4(t["q4p"]).astype(jnp.int4), "s": t["s"]}
        return t

    return jax.tree.map(unp, params, is_leaf=is_q)


def persist_int4_params(params: PyTree) -> PyTree:
    """Unpack packed-int4 leaves ONCE and keep the s4 arrays as the only
    at-rest weight copy (round-4 serving-capacity lever).

    The in-jit unpack of unpack_int4_params is correct but forces HBM to
    hold BOTH the packed input and the materialized s4 temp for the whole
    call (~6 GB for the 7B, ~8 GB for the 8B — the "packed-and-unpacked"
    term in the PERF_NOTES slot budgets). This helper runs the unpack in
    its own jit with the packed buffers DONATED, so after it returns the
    device holds only the s4 copy; generate/resume/refill then take s4
    inputs directly (their internal unpack_int4_params is a no-op on
    already-unpacked leaves).

    s4 jit inputs trip a layout-metadata bug on the axon TPU tunnel
    ("Recursively calling jit"); utils/subbyte_io.py diagnoses and patches
    it — installed here before the first s4 array crosses a jit boundary.
    Safe (and pointless) off-TPU; loaders call this only for bits=4 params.

    CONSUMES its input: the packed buffers are donated, so pass-through
    leaves of the input tree may be invalidated — always reassign
    ``params = persist_int4_params(params)`` and drop other references.

    Memory shape of the call (round-5 verdict #6): the unpack changes dtype
    and layout (uint8 [.., O, K/2] -> s4 [.., O, K]), so XLA can NEVER alias
    input to output and a whole-tree donated jit (a) held every packed input
    until the computation finished — a full 2x-weights transient — and
    (b) printed "Some donated buffers were not usable" into headline
    benches. Unpacking leaf-by-leaf in per-leaf donated jits bounds the
    transient to ONE stacked leaf (~0.9 GB for the 7B) — executions
    serialize on the device stream, each packed leaf frees when its call
    retires, and packed/s4 bytes are equal (both 2 values/byte) so the
    running total stays ~flat. The donation itself is still load-bearing
    (it's what releases each packed buffer); only the cannot-alias warning
    is expected, and is silenced here with this justification.
    """
    import warnings as _warnings

    import jax as _jax

    from ..utils.subbyte_io import install_subbyte_layout_workaround

    def is_q(t):
        return isinstance(t, dict) and "q4p" in t

    has_packed = any(
        is_q(t)
        for t in _jax.tree.leaves(
            params,
            is_leaf=lambda t: isinstance(t, dict) and ("q4p" in t or "q" in t),
        )
    )
    if not has_packed:
        return params
    install_subbyte_layout_workaround()

    unp = _jax.jit(
        lambda t: {"q": unpack_int4(t["q4p"]).astype(jnp.int4), "s": t["s"]},
        donate_argnums=0,
    )

    def walk(t):
        if not is_q(t):
            return t
        with _warnings.catch_warnings():
            _warnings.filterwarnings(
                "ignore", message=".*donated buffers were not usable.*"
            )
            return unp(t)

    return _jax.tree.map(walk, params, is_leaf=is_q)


def embed_lookup(params: PyTree, ids: jnp.ndarray, dtype) -> jnp.ndarray:
    """Embedding-table gather, bf16 or int8-quantized.

    quantize_weights(embed_bits=8) stores the table as {"q": int8 [V, D],
    "s": bf16 [V]} (per-ROW scale — each vocab row quantizes against its own
    max, so the gather dequantizes exactly the rows it reads). This is a
    CAPACITY lever, not a bandwidth one: a decode step gathers only W rows,
    but the at-rest table halves (Emu3's 184k x 4096 bf16 = 1.45 GB ->
    0.73 GB), which is what frees the next serving slot (PERF_NOTES slot
    budget; VERDICT r3 #4)."""
    e = params["embed"]
    if isinstance(e, dict):
        rows = e["q"][ids].astype(jnp.float32)
        return (rows * e["s"][ids].astype(jnp.float32)[..., None]).astype(dtype)
    return e[ids].astype(dtype)


def linear_multi(x: jnp.ndarray, ws, act_quant: str = "bf16"):
    """Several projections of the SAME input (qkv, gate/up): the activation
    quantization chain runs once and is shared across the dots — the chain
    (fp32 convert, abs-max reduce, scale, round, clip) is a fusion barrier
    XLA can't sink into the matmuls, so per-layer it's 2 chains instead of 5.
    """
    if not isinstance(ws[0], dict):
        return [_dot_last(x, w, x.dtype) for w in ws]
    if "q4p" in ws[0]:
        # packed leaves reaching a dot directly (prefill paths that skipped
        # unpack_int4_params, CPU tests): unpack inline — correct anywhere,
        # but per-use; the decode hot path unpacks stacked arrays once
        ws = [
            {"q": unpack_int4(w["q4p"]).astype(jnp.int4), "s": w["s"]}
            for w in ws
        ]
    if ws[0]["q"].dtype == jnp.int4 and act_quant != "int8":
        # s4 weights default to the bf16 multiply; act_quant="int8" (W4A8)
        # instead widens s4 -> s8 at the operand read and runs the int8 MXU
        # path (2x MXU throughput) — a batch-serving trade measured below
        act_quant = "bf16"
    if act_quant == "bf16":
        outs = []
        for w in ws:
            acc = _dot_last(x, w["q"].astype(x.dtype), jnp.float32)
            outs.append((acc * w["s"].astype(jnp.float32)).astype(x.dtype))
        return outs
    xq, xs = _quantize_act(x)
    outs = []
    for w in ws:
        wq = w["q"]
        if wq.dtype == jnp.int4:
            # W4A8: widen to s8 at the operand read (fused by XLA; storage
            # and HBM traffic stay 4-bit) so the dot runs on the int8 MXU
            wq = wq.astype(jnp.int8)
        acc = _dot_last(xq, wq, jnp.int32)
        y = acc.astype(jnp.float32) * xs * w["s"].astype(jnp.float32)
        outs.append(y.astype(x.dtype))
    return outs


def equilibrate_for_int4(
    params: PyTree, cfg: Optional["DecoderConfig"] = None
) -> PyTree:
    """Exact (lossless in fp) column equilibration before int4 quantization.

    Per-channel int4 error scales with each output row's max |w|; when a few
    INPUT columns dominate a projection, every row's scale is inflated by
    them. Scaling projection column k by c[k] = colmax[k]^-0.5 (and its
    input by c[k]^-1) compresses the column dynamic range by a square root
    at zero runtime cost, because every inverse folds EXACTLY into an
    adjacent parameter (the SmoothQuant/AWQ fold, done weight-only here):

      * wq/wk/wv   <- attn_norm scale   (their shared input is the pre-norm)
      * w_gate/w_up<- mlp_norm scale
      * wo         <- wv output rows    (attention mixes v linearly; under
                                         GQA the scale is shared across the
                                         q-heads of each kv group)
      * w_down     <- w_up output rows  (silu(gate) * up is linear in up)
      * lm_head    <- final_norm scale  (skipped for tied embeddings)

    The norm folds require pre-norm layers (they are skipped when
    cfg.swin_norm, where sublayer inputs are the raw residual stream); the
    wv/w_up row folds are norm-free and always apply. Returns a pytree that
    computes IDENTICAL fp outputs (tested to fp tolerance in
    tests/test_weight_quant.py) but quantizes to int4 with smaller error.
    """
    lay = dict(params["layers"])
    pre_norm = not (cfg is not None and cfg.swin_norm)

    def colscale(*ws):
        cm = jnp.max(
            jnp.stack([jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2) for w in ws]),
            axis=0,
        )  # [.., K]
        return jnp.maximum(jnp.sqrt(jnp.maximum(cm, 1e-8)), 1e-4)

    if pre_norm:
        c_attn = colscale(lay["wq"], lay["wk"], lay["wv"])  # [n, d]
        for k in ("wq", "wk", "wv"):
            lay[k] = (lay[k].astype(jnp.float32) / c_attn[:, None, :]).astype(
                lay[k].dtype
            )
        lay["attn_norm"] = (
            lay["attn_norm"].astype(jnp.float32) * c_attn
        ).astype(lay["attn_norm"].dtype)

        c_mlp = colscale(lay["w_gate"], lay["w_up"])
        for k in ("w_gate", "w_up"):
            lay[k] = (lay[k].astype(jnp.float32) / c_mlp[:, None, :]).astype(
                lay[k].dtype
            )
        lay["mlp_norm"] = (
            lay["mlp_norm"].astype(jnp.float32) * c_mlp
        ).astype(lay["mlp_norm"].dtype)

    # wo <- wv rows: wo's input channel (h, d) carries v channel (h//g, d)
    if cfg is not None:
        n = lay["wo"].shape[0]
        H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        group = H // Hkv
        wo4 = lay["wo"].astype(jnp.float32).reshape(n, -1, Hkv, group, D)
        cm = jnp.max(jnp.abs(wo4), axis=(1, 3))  # [n, Hkv, D]
        c_kv = jnp.maximum(jnp.sqrt(jnp.maximum(cm, 1e-8)), 1e-4)
        lay["wo"] = (wo4 / c_kv[:, None, :, None, :]).reshape(
            lay["wo"].shape
        ).astype(lay["wo"].dtype)
        wv3 = lay["wv"].astype(jnp.float32).reshape(n, Hkv, D, -1)
        lay["wv"] = (wv3 * c_kv[..., None]).reshape(lay["wv"].shape).astype(
            lay["wv"].dtype
        )

    # w_down <- w_up rows
    c_i = colscale(lay["w_down"])  # [n, intermediate]
    lay["w_down"] = (
        lay["w_down"].astype(jnp.float32) / c_i[:, None, :]
    ).astype(lay["w_down"].dtype)
    lay["w_up"] = (lay["w_up"].astype(jnp.float32) * c_i[..., None]).astype(
        lay["w_up"].dtype
    )

    out = dict(params)
    out["layers"] = lay
    if pre_norm and "lm_head" in params:
        c_h = colscale(params["lm_head"])  # [d]
        out["lm_head"] = (
            params["lm_head"].astype(jnp.float32) / c_h[None, :]
        ).astype(params["lm_head"].dtype)
        out["final_norm"] = (
            params["final_norm"].astype(jnp.float32) * c_h
        ).astype(params["final_norm"].dtype)
    return out


def quantize_weights(
    params: PyTree, *, quantize_head: bool = True, bits: int = 8,
    head_bits: Optional[int] = None, equilibrate: bool = True,
    config: Optional["DecoderConfig"] = None,
    embed_bits: Optional[int] = None,
) -> PyTree:
    """Symmetric intN quantization of every projection weight in a decoder
    pytree (weights already in [layer, out, in] layout). Norm scales and
    qk-norm affines stay bf16; the embedding table stays bf16 unless
    ``embed_bits=8`` quantizes it per row (see embed_lookup — halves the
    at-rest table for the big-vocab models; requires untied embeddings).

    bits=8: {"q": int8, "s": [.., O]} per-output-channel — the W8A16
    production default.
    bits=4: {"q4p": uint8 [.., O, K/2] (two nibbles per byte, split-half
    layout — see unpack_int4), "s": [.., O]} — halves at-rest weight HBM AND
    per-step weight reads (the single biggest decode cost; PERF_NOTES.md).
    Packed uint8 crosses the jit boundary safely (s4 jit inputs trip a
    runtime bug in the axon TPU tunnel, "Recursively calling jit"); the
    in-jit unpack to s4 is loop-invariant and hoisted out of the decode
    while_loop. Accuracy at per-channel granularity is recovered by the
    exact column equilibration of ``equilibrate_for_int4`` (on by default;
    pass the model's DecoderConfig as ``config`` to enable the head-aware
    wo<-wv fold and the swin_norm gating). Odd-K weights fall back to int8.
    With real checkpoints, validate int4 quality (FID) before production.

    Pure/traceable: for big models, run it fused with the weight producer
    (e.g. ``jax.jit(lambda k: quantize_weights(init_params(k, cfg)))`` or on
    host-side numpy arrays from checkpoint porting) so bf16 and int8 copies
    never coexist in HBM — 7B bf16 + int8 together exceed a v5e chip.
    CAUTION: with equilibrate=True the fold ties every projection's liveness
    together (c vectors cross weights), so the fused-on-device build needs
    all bf16 weights resident at once — fine for 7B (13 GB), OOM for the 8B
    Emu3 on one 16 GB chip. Quantize host-side (checkpoint port) or pass
    equilibrate=False there.
    """
    big = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"}

    def quant8(w: jnp.ndarray) -> dict:
        wf = w.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(wf), axis=-1) / 127.0, 1e-8)
        q = jnp.clip(jnp.round(wf / s[..., None]), -127, 127).astype(jnp.int8)
        return {"q": q, "s": s.astype(jnp.bfloat16)}

    def quant4(w: jnp.ndarray) -> dict:
        K = w.shape[-1]
        if K % 2:
            return quant8(w)
        wf = w.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(wf), axis=-1) / 7.0, 1e-8)
        q = jnp.clip(jnp.round(wf / s[..., None]), -8, 7).astype(jnp.int8)
        lo = q[..., : K // 2]
        hi = q[..., K // 2 :]
        packed = (lo & 0xF).astype(jnp.uint8) | (
            jax.lax.shift_left(hi.astype(jnp.uint8), jnp.uint8(4))
        )
        return {"q4p": packed, "s": s.astype(jnp.bfloat16)}

    if bits == 4 and equilibrate:
        params = equilibrate_for_int4(params, config)

    quant = quant4 if bits == 4 else quant8
    out = dict(params)
    out["layers"] = {
        k: (quant(v) if k in big else v) for k, v in params["layers"].items()
    }
    if quantize_head and "lm_head" in params:
        # head_bits: the lm_head is ~2% of weight bytes but its logits feed
        # the speculative-acceptance test directly; int8 there recovers part
        # of the int4 NFE regression at negligible bandwidth cost.
        hq = quant4 if (head_bits or bits) == 4 else quant8
        out["lm_head"] = hq(params["lm_head"])
    if embed_bits:
        assert embed_bits == 8, "embedding quantization supports int8 only"
        assert "lm_head" in params, (
            "embed_bits requires untied embeddings (a tied model reads the "
            "table as the output projection too)")
        out["embed"] = quant8(params["embed"])  # per-row scale
    return out


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale


def head_layer_norm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float
) -> jnp.ndarray:
    """Chameleon qk-norm: LayerNorm over head_dim, per-head affine.

    x: [S, T, H, D]; scale/bias: [H, D].
    Mirrors ChameleonLayerNorm (modeling_chameleon.py:198-221): stats over the
    last dim only, affine applied per head.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def write_kv(cache: jnp.ndarray, new: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Write a [S, T, H, D] window into a [S, L_buf, H, D] buffer at
    per-sample row offsets via a vmapped dynamic-update-slice (an in-place
    batched scatter). Measured note (v5e): collapsing aligned offsets to one
    scalar DUS over the whole batch is ~30%% SLOWER than this scatter
    (48.5 vs 37.6 ms/step on the 7B CFG decode), so per-sample offsets are
    used unconditionally."""
    if offsets.ndim == 0:
        offsets = jnp.full((cache.shape[0],), offsets, jnp.int32)

    def upd(c, n, o):  # rank-agnostic: [L, H, D] KV rows or [L, H] scales
        return jax.lax.dynamic_update_slice(c, n, (o,) + (0,) * (c.ndim - 1))

    return jax.vmap(upd)(cache, new, offsets)


def write_kv_layer(
    buf: jnp.ndarray,  # [S, n_layers, L_buf, H, D] (or [.., H] for scales)
    new: jnp.ndarray,  # [S, T, H, D] (or [S, T, H])
    layer: jnp.ndarray,  # scalar int32
    offsets: jnp.ndarray,  # [S] per-sample row offsets
) -> jnp.ndarray:
    """Scatter a window directly into one layer of the full stacked cache.

    The caches ride the layer-scan *carry* (not xs/ys): scan's stacked-output
    path double-buffers, costing a full cache copy (~2.6 GB read+write per 7B
    CFG step); an in-carry scatter writes only the T new rows in place.
    The buffer is SAMPLE-major (see KVCache) so this vmap runs over the
    leading axis and the carry's preferred physical layout equals the
    default layout — no transpose copies at jit boundaries."""
    if offsets.ndim == 0:
        offsets = jnp.full((buf.shape[0],), offsets, jnp.int32)

    def upd(c, n, o):  # c: [n_layers, L_buf, H(, D)] (one sample), n: [T, H(, D)]
        return jax.lax.dynamic_update_slice(
            c, n[None], (layer, o) + (0,) * (c.ndim - 2)
        )

    return jax.vmap(upd)(buf, new, offsets)


def _attend(
    q: jnp.ndarray,  # [S, T, H, D]
    k: jnp.ndarray,  # [S, L, Hkv, D]
    v: jnp.ndarray,  # [S, L, Hkv, D]
    mask: jnp.ndarray,  # [S, T, L] bool
) -> jnp.ndarray:
    """Masked MHA/GQA attention without materializing repeated KV heads."""
    S, T, H, D = q.shape
    Hkv = k.shape[2]
    group = H // Hkv
    qg = q.reshape(S, T, Hkv, group, D)
    scores = jnp.einsum(
        "sthgd,slhd->shgtl", qg, k, preferred_element_type=jnp.float32
    ) / math.sqrt(D)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask[:, None, None, :, :], scores, neg)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "shgtl,slhd->sthgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(S, T, H, D).astype(q.dtype)


def _attend_quantized(
    q: jnp.ndarray,  # [S, T, H, D]
    k_q: jnp.ndarray,  # [S, L, Hkv, D] int8
    v_q: jnp.ndarray,  # [S, L, Hkv, D] int8
    k_s: jnp.ndarray,  # [S, L, Hkv] bf16
    v_s: jnp.ndarray,  # [S, L, Hkv] bf16
    mask: jnp.ndarray,  # [S, T, L] bool
) -> jnp.ndarray:
    """Attention directly over the int8 cache: the per-row scales factor out
    of both dots (scores = (q . k_int8) * s_k[j]; out = (p * s_v[j]) . v_int8),
    so the dequantized [S, L, H, D] tensors are never materialized in HBM —
    the int8 -> bf16 convert fuses into the MXU operand read."""
    S, T, H, D = q.shape
    Hkv = k_q.shape[2]
    group = H // Hkv
    qg = q.reshape(S, T, Hkv, group, D)
    scores = jnp.einsum(
        "sthgd,slhd->shgtl", qg, k_q.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * (k_s.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, None, :] / math.sqrt(D))
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask[:, None, None, :, :], scores, neg)
    probs = jax.nn.softmax(scores, axis=-1)
    probs_scaled = probs * v_s.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum(
        "shgtl,slhd->sthgd", probs_scaled.astype(q.dtype), v_q.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(S, T, H, D).astype(q.dtype)


def _attend_chunked(
    q: jnp.ndarray,  # [S, T, H, D]
    k: jnp.ndarray,  # [S, L, Hkv, D] (int8 when scales given)
    v: jnp.ndarray,
    k_s: Optional[jnp.ndarray],  # [S, L, Hkv] or None
    v_s: Optional[jnp.ndarray],
    mask: jnp.ndarray,  # [S, T, L] bool
    n_live: jnp.ndarray,  # scalar int32 — rows that can be attended at all
    chunk: int,
) -> jnp.ndarray:
    """Flash-decoding over the live cache prefix only.

    The cache buffer is sized for the whole generation, but early steps have
    few live rows; monolithic attention pays full-buffer HBM reads + score
    math every step (measured v5e 7B CFG: 15.4 ms/forward at 2496 rows vs
    12.4 at 640). A fori_loop with a *dynamic trip count* walks 512-row
    chunks up to the live edge — an online-softmax merge keeps it exact, and
    dynamic_slice reads only the chunk (a lax.switch over static bucket
    slices was measured WORSE than monolithic — the conditional copies its
    big operands)."""
    S, T, H, D = q.shape
    L = k.shape[1]
    Hkv = k.shape[2]
    group = H // Hkv
    qg = q.reshape(S, T, Hkv, group, D)
    n_chunks = (n_live + chunk - 1) // chunk
    neg = jnp.finfo(jnp.float32).min

    m0 = jnp.full((S, Hkv, group, T), neg, jnp.float32)
    l0 = jnp.zeros((S, Hkv, group, T), jnp.float32)
    a0 = jnp.zeros((S, Hkv, group, T, D), jnp.float32)

    def body(c, carry):
        m, l, acc = carry
        start = c * chunk
        kc = jax.lax.dynamic_slice(k, (0, start, 0, 0), (S, chunk, Hkv, D))
        vc = jax.lax.dynamic_slice(v, (0, start, 0, 0), (S, chunk, Hkv, D))
        maskc = jax.lax.dynamic_slice(mask, (0, 0, start), (S, T, chunk))
        s = jnp.einsum(
            "sthgd,slhd->shgtl", qg, kc.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        if k_s is not None:
            ksc = jax.lax.dynamic_slice(k_s, (0, start, 0), (S, chunk, Hkv))
            s = s * (
                ksc.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, None, :]
                / math.sqrt(D)
            )
        else:
            s = s / math.sqrt(D)
        s = jnp.where(maskc[:, None, None, :, :], s, neg)
        m2 = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m2[..., None])
        corr = jnp.exp(m - m2)
        l2 = l * corr + jnp.sum(p, axis=-1)
        if v_s is not None:
            vsc = jax.lax.dynamic_slice(v_s, (0, start, 0), (S, chunk, Hkv))
            p = p * vsc.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, None, :]
        pv = jnp.einsum(
            "shgtl,slhd->sthgd", p.astype(v.dtype if v_s is None else q.dtype),
            vc.astype(q.dtype), preferred_element_type=jnp.float32,
        ).transpose(0, 2, 3, 1, 4)  # -> [S, Hkv, group, T, D]
        acc2 = acc * corr[..., None] + pv
        return m2, l2, acc2

    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, a0))
    out = acc / jnp.maximum(l, 1e-37)[..., None]  # [S, Hkv, group, T, D]
    return out.transpose(0, 3, 1, 2, 4).reshape(S, T, H, D).astype(q.dtype)


def _decode_masks(
    cache_end: jnp.ndarray,  # [S] or scalar
    valid: jnp.ndarray,  # [S, L_buf]
    T: int,
    L_buf: int,
) -> jnp.ndarray:
    """Attention mask for a draft window appended at cache_end.

    Query (window slot) i may attend key row j iff
      j <= cache_end + i    (prefix + causal within the window)
      and valid[j]          (CFG/padding prompt masking; rows past the prompt
                             are initialized valid, so committed tokens and
                             window rows always pass)
    This reproduces the reference's grown rectangular mask with a tril block
    on the new-token diagonal (jacobi_iteration_lumina_mgpt.py:816-846) as a
    pure function of (cache_end, valid) with static shapes. NOTE: the mask
    must NOT whitelist rows >= cache_end unconditionally — during prefill
    cache_end is 0 and that would bypass left-padding masks entirely.
    """
    j = jnp.arange(L_buf, dtype=jnp.int32)[None, None, :]
    i = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    if cache_end.ndim == 0:
        cache_end = jnp.full((valid.shape[0],), cache_end, jnp.int32)
    ce = cache_end[:, None, None]
    causal = j <= ce + i
    return causal & valid[:, None, :]


class ForwardResult(NamedTuple):
    logits: jnp.ndarray  # [S, T_out, V] float32
    kv: KVCache


def forward(
    params: PyTree,
    cfg: DecoderConfig,
    ids: jnp.ndarray,  # [S, T] int32
    positions: jnp.ndarray,  # [S, T] int32 (per-sample position ids)
    kv: KVCache,
    cache_end: jnp.ndarray,  # [S] int32 — rows already live in the cache
    valid: jnp.ndarray,  # [S, L_buf] bool — attendable prefix mask
    rope_table: jnp.ndarray,  # [P, 2, D]
    *,
    logits_tail: Optional[int] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
) -> ForwardResult:
    """One forward over a window of T tokens with the static KV cache.

    Used both for prefill (T = prompt length, cache_end = 0) and for SJD
    draft windows (T = window size). Returns fp32 logits for the last
    ``logits_tail`` positions (all positions if None) and the updated cache.
    """
    S, T = ids.shape
    L_buf = kv.buf_len
    # packed-int4 fallback for DIRECT forward() callers (tests, latency
    # probes): unpack the stacked arrays before the layer scan. This runs
    # once per forward; XLA does NOT hoist it out of an enclosing
    # while_loop (measured - see unpack_int4_params), so serving loops must
    # pre-unpack outside the loop the way SJDEngine does (after which this
    # is a no-op).
    params = unpack_int4_params(params)

    if inputs_embeds is not None:
        h = inputs_embeds.astype(cfg.dtype)
    else:
        h = embed_lookup(params, ids, cfg.dtype)

    rope = rope_table[positions]  # [S, T, 2, D]
    cos, sin = rope[:, :, 0, :], rope[:, :, 1, :]
    mask = _decode_masks(cache_end, valid, T, L_buf)

    # The cache buffers ride the scan CARRY and are updated in place with
    # row-scatters at (layer, sample, cache_end): threading them through
    # xs/ys instead makes scan stack fresh per-layer outputs — a full
    # read+write copy of the multi-GB cache every forward (measured ~3 ms
    # of pure HBM traffic on the 7B CFG step).
    scale_end = (
        jnp.full((S,), cache_end, jnp.int32) if cache_end.ndim == 0 else cache_end
    )

    # "auto": the Mosaic flash-decode kernel for single-chip TPU decode
    # windows; plain XLA everywhere else —
    #   * off-TPU (CPU tests, virtual meshes): no Mosaic;
    #   * multi-device processes: pallas_call is not GSPMD-partitionable,
    #     sharded (TP/DP) forwards must stay XLA;
    #   * long-T forwards (prefill): the kernel's q block and fp32 VMEM
    #     scratch scale with T*group and would blow VMEM at prompt lengths —
    #     prefill runs once, the XLA path is fine there.
    # The T cutoff is 32 (decode windows), not the kernel's hard limit: the
    # kernel's f32 score intermediates scale with Hkv*W*group*chunk and a
    # T=53 prefill through it exceeded the 16 MB scoped-VMEM budget once the
    # stacked-cache operands landed. Prefill runs once — XLA is fine there.
    attn_impl = cfg.attn_impl
    if attn_impl == "auto":
        single_tpu = jax.default_backend() == "tpu" and jax.device_count() == 1
        attn_impl = "pallas" if (single_tpu and T <= 32) else "xla"
    elif attn_impl in ("pallas", "pallas_tp") and T > 32:
        attn_impl = "xla"

    # Live-prefix chunked attention (see _attend_chunked / DecoderConfig
    # .attn_buckets). Falls back to monolithic attention unless the buffer
    # divides into whole chunks (a single chunk == whole buffer is exact).
    chunk = min(cfg.attn_buckets, L_buf) if cfg.attn_buckets else 0
    use_chunked = (
        chunk > 0 and attn_impl == "xla" and L_buf % chunk == 0
    )
    n_live = jnp.max(scale_end) + T  # live rows + the window being written

    def layer(carry, p):
        if cfg.kv_quant:
            h, i, k_buf, v_buf, ks_buf, vs_buf = carry
        else:
            h, i, k_buf, v_buf = carry
            ks_buf = vs_buf = None

        # fused epilogue additionally requires head_dim to be a whole
        # number of 128-wide lanes: the in-kernel [T, H*D] -> [T, H, D]
        # reshape only lowers in Mosaic when D is a lane multiple
        # (D=32 fails with "unsupported shape cast"); production heads
        # are 128, small test configs fall back to the jnp chain (the
        # flash-decode attention kernel itself still runs).
        use_fused = attn_impl == "pallas" and cfg.head_dim % 128 == 0

        def attn_block(x):
            qp, kp, vp = linear_multi(x, (p["wq"], p["wk"], p["wv"]), cfg.act_quant)
            if use_fused:
                # fused per-layer epilogue: qk-norm + rope + KV int8
                # quantization in one Pallas kernel instead of ~8 small XLA
                # fusions (bit-identical; ops/fused_epilogue.py). Scoped
                # with the flash-decode kernel: single-chip TPU decode.
                from ..ops.fused_epilogue import fused_epilogue

                q, k_or_kq, v_or_vq, kscale, vscale = fused_epilogue(
                    qp, kp, vp,
                    p.get("q_norm_scale") if cfg.qk_norm else None,
                    p.get("q_norm_bias") if cfg.qk_norm else None,
                    p.get("k_norm_scale") if cfg.qk_norm else None,
                    p.get("k_norm_bias") if cfg.qk_norm else None,
                    cos, sin,
                    num_heads=cfg.num_heads, num_kv_heads=cfg.num_kv_heads,
                    head_dim=cfg.head_dim, qk_norm=cfg.qk_norm,
                    quantize=cfg.kv_quant, eps=cfg.qk_norm_eps,
                )
                k = v = None  # unused below on this path
            else:
                q = qp.reshape(S, T, cfg.num_heads, cfg.head_dim)
                k = kp.reshape(S, T, cfg.num_kv_heads, cfg.head_dim)
                v = vp.reshape(S, T, cfg.num_kv_heads, cfg.head_dim)
                if cfg.qk_norm:
                    q = head_layer_norm(
                        q, p["q_norm_scale"], p["q_norm_bias"], cfg.qk_norm_eps
                    )
                    k = head_layer_norm(
                        k, p["k_norm_scale"], p["k_norm_bias"], cfg.qk_norm_eps
                    )
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
            if cfg.kv_quant:
                if use_fused:
                    kq, vq = k_or_kq, v_or_vq
                else:
                    kq, kscale = _quantize_rows(k)
                    vq, vscale = _quantize_rows(v)
                kb = write_kv_layer(k_buf, kq, i, cache_end)
                vb = write_kv_layer(v_buf, vq, i, cache_end)
                ksb = write_kv_layer(ks_buf, kscale, i, scale_end)
                vsb = write_kv_layer(vs_buf, vscale, i, scale_end)
                # Pallas paths take the FULL stacked cache and select the
                # layer in the kernel's index maps: slicing the layer out
                # here would materialize a whole-buffer copy per layer per
                # step (XLA can't fuse a slice into a pallas operand) —
                # measured 3.2 ms/step at S=2 / 12.8 at S=8 on 7B 768px.
                if attn_impl == "pallas":
                    from ..ops.decode_attention import decode_attention

                    out = decode_attention(
                        q, kb, vb, ksb, vsb,
                        cache_end, valid, window=T, layer=i,
                    )
                elif attn_impl == "pallas_tp":
                    from ..ops.decode_attention import decode_attention_tp

                    out = decode_attention_tp(
                        q, kb, vb, ksb, vsb,
                        cache_end, valid, window=T, layer=i,
                    )
                else:
                    k_all_q = jax.lax.dynamic_index_in_dim(kb, i, 1, keepdims=False)
                    v_all_q = jax.lax.dynamic_index_in_dim(vb, i, 1, keepdims=False)
                    ks_all = jax.lax.dynamic_index_in_dim(ksb, i, 1, keepdims=False)
                    vs_all = jax.lax.dynamic_index_in_dim(vsb, i, 1, keepdims=False)
                    if use_chunked:
                        out = _attend_chunked(
                            q, k_all_q, v_all_q, ks_all, vs_all, mask, n_live, chunk
                        )
                    else:
                        out = _attend_quantized(
                            q, k_all_q, v_all_q, ks_all, vs_all, mask
                        )
                caches = (kb, vb, ksb, vsb)
            else:
                if use_fused:
                    k, v = k_or_kq, v_or_vq
                kb = write_kv_layer(k_buf, k, i, cache_end)
                vb = write_kv_layer(v_buf, v, i, cache_end)
                if attn_impl == "pallas":
                    from ..ops.decode_attention import decode_attention

                    out = decode_attention(
                        q, kb, vb, None, None, cache_end, valid,
                        window=T, layer=i,
                    )
                elif attn_impl == "pallas_tp":
                    from ..ops.decode_attention import decode_attention_tp

                    out = decode_attention_tp(
                        q, kb, vb, None, None, cache_end, valid,
                        window=T, layer=i,
                    )
                else:
                    k_all = jax.lax.dynamic_index_in_dim(kb, i, 1, keepdims=False)
                    v_all = jax.lax.dynamic_index_in_dim(vb, i, 1, keepdims=False)
                    if use_chunked:
                        out = _attend_chunked(
                            q, k_all, v_all, None, None, mask, n_live, chunk
                        )
                    else:
                        out = _attend(q, k_all, v_all, mask)
                caches = (kb, vb)
            return linear(out.reshape(S, T, cfg.q_dim), p["wo"], cfg.act_quant), caches

        def mlp_block(x):
            g, u = linear_multi(x, (p["w_gate"], p["w_up"]), cfg.act_quant)
            return linear(
                jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u,
                p["w_down"], cfg.act_quant,
            )

        if cfg.swin_norm:
            # Chameleon swin variant: residual + norm(sublayer(x))
            a, caches = attn_block(h)
            h1 = h + rms_norm(a, p["attn_norm"], cfg.norm_eps)
            h2 = h1 + rms_norm(mlp_block(h1), p["mlp_norm"], cfg.norm_eps)
        else:
            a, caches = attn_block(rms_norm(h, p["attn_norm"], cfg.norm_eps))
            h1 = h + a
            h2 = h1 + mlp_block(rms_norm(h1, p["mlp_norm"], cfg.norm_eps))
        return (h2, i + 1) + caches, None

    if cfg.kv_quant:
        carry0 = (h, jnp.int32(0), kv.k, kv.v, kv.k_scale, kv.v_scale)
        carry, _ = jax.lax.scan(layer, carry0, params["layers"])
        h, _, k_new, v_new, ks_new, vs_new = carry
        new_kv = KVCache(k_new, v_new, ks_new, vs_new)
    else:
        carry0 = (h, jnp.int32(0), kv.k, kv.v)
        (h, _, k_new, v_new), _ = jax.lax.scan(layer, carry0, params["layers"])
        new_kv = KVCache(k_new, v_new)
    h = rms_norm(h, params["final_norm"], cfg.norm_eps)

    if logits_tail is not None and logits_tail < T:
        h = h[:, T - logits_tail :, :]

    if cfg.tie_word_embeddings:
        logits = jnp.einsum(
            "std,vd->stv", h, params["embed"], preferred_element_type=jnp.float32
        )
    else:
        logits = linear(h, params["lm_head"], cfg.act_quant)
    return ForwardResult(logits=logits.astype(jnp.float32), kv=new_kv)


def forward_train(
    params: PyTree,
    cfg: DecoderConfig,
    ids: jnp.ndarray,  # [B, T]
    positions: jnp.ndarray,  # [B, T]
    attn_mask: Optional[jnp.ndarray] = None,  # [B, T] bool padding mask
    rope_table: Optional[jnp.ndarray] = None,
    remat: bool = True,
) -> jnp.ndarray:
    """Cache-free causal forward for training/evaluating full sequences.

    Returns fp32 logits [B, T, V]. Uses `jax.checkpoint` on the layer body to
    trade FLOPs for HBM (the TPU equivalent of the reference's FSDP
    activation checkpointing, xllmx/solvers/finetune/finetune.py:348-358).
    """
    B, T = ids.shape
    params = unpack_int4_params(params)
    if rope_table is None:
        rope_table = make_rope_table(cfg, int(positions.max()) + 1 if positions.size else T)
    h = embed_lookup(params, ids, cfg.dtype)
    rope = rope_table[positions]
    cos, sin = rope[:, :, 0, :], rope[:, :, 1, :]
    i = jnp.arange(T, dtype=jnp.int32)
    mask = i[None, :, None] >= i[None, None, :]  # [1, T, T]
    if attn_mask is not None:
        mask = mask & attn_mask[:, None, :]
    mask = jnp.broadcast_to(mask, (B, T, T))

    def layer(h, p):
        def attn_block(x):
            q = linear(x, p["wq"], cfg.act_quant).reshape(
                B, T, cfg.num_heads, cfg.head_dim)
            k = linear(x, p["wk"], cfg.act_quant).reshape(
                B, T, cfg.num_kv_heads, cfg.head_dim)
            v = linear(x, p["wv"], cfg.act_quant).reshape(
                B, T, cfg.num_kv_heads, cfg.head_dim)
            if cfg.qk_norm:
                q = head_layer_norm(
                    q, p["q_norm_scale"], p["q_norm_bias"], cfg.qk_norm_eps
                )
                k = head_layer_norm(
                    k, p["k_norm_scale"], p["k_norm_bias"], cfg.qk_norm_eps
                )
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            return linear(
                _attend(q, k, v, mask).reshape(B, T, cfg.q_dim),
                p["wo"], cfg.act_quant,
            )

        def mlp_block(x):
            g = linear(x, p["w_gate"], cfg.act_quant)
            u = linear(x, p["w_up"], cfg.act_quant)
            return linear(
                jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u,
                p["w_down"], cfg.act_quant,
            )

        if cfg.swin_norm:
            h1 = h + rms_norm(attn_block(h), p["attn_norm"], cfg.norm_eps)
            h2 = h1 + rms_norm(mlp_block(h1), p["mlp_norm"], cfg.norm_eps)
        else:
            h1 = h + attn_block(rms_norm(h, p["attn_norm"], cfg.norm_eps))
            h2 = h1 + mlp_block(rms_norm(h1, p["mlp_norm"], cfg.norm_eps))
        return h2, None

    body = jax.checkpoint(layer) if remat else layer
    h, _ = jax.lax.scan(body, h, params["layers"])
    h = rms_norm(h, params["final_norm"], cfg.norm_eps)
    if cfg.tie_word_embeddings:
        return jnp.einsum(
            "btd,vd->btv", h, params["embed"], preferred_element_type=jnp.float32
        ).astype(jnp.float32)
    return linear(h, params["lm_head"], cfg.act_quant).astype(jnp.float32)
