"""Quantization-fidelity metrics: per-layer output error + end-logits KL.

The serving stack quantizes weights (int8 W8A16 / packed-int4 W4A16 with
exact column equilibration — transformer.quantize_weights) and claims the
int4 accuracy story on the equilibration fold. With no checkpoints in this
environment a FID comparison is impossible, so this module quantifies
fidelity directly on the forward: for each weight variant it reports

  * per-layer RELATIVE output MSE   ||h_q - h_bf16||^2 / ||h_bf16||^2
    (per decoder layer, on the residual stream after the layer), and
  * end-logits KL(p_bf16 || p_q)    averaged over positions

against the bf16 forward on identical inputs. The acceptance test of the SJD
engine consumes exactly these logits (core/acceptance.py), so logits-KL is
the right proxy for NFE/quality drift.

The equilibration claim is asserted under *outlier-bearing* weights
(tests/test_quant_fidelity.py injects dominant input columns, the regime
SmoothQuant/AWQ address; on plain random weights the fold is a no-op by
design). With real checkpoints, README.md documents the FID procedure.

Reference anchor: the reference serves fp16/bf16 only — quantized serving is
an addition of this framework, so fidelity is measured against our own bf16
forward, which IS reference-parity (tests/test_port_parity.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .transformer import (
    DecoderConfig,
    _attend,
    apply_rope,
    head_layer_norm,
    linear,
    linear_multi,
    make_rope_table,
    rms_norm,
    unpack_int4_params,
)

PyTree = Any


def layer_outputs(
    params: PyTree,
    cfg: DecoderConfig,
    ids: jnp.ndarray,  # [B, T]
    positions: Optional[jnp.ndarray] = None,  # [B, T]
    rope_table: Optional[jnp.ndarray] = None,
):
    """Cache-free causal forward returning (per-layer residual stream
    [n_layers, B, T, D] fp32, logits [B, T, V] fp32).

    Mirrors transformer.forward_train's layer body exactly, with the scan
    emitting each layer's output into ys for fidelity probing.
    """
    B, T = ids.shape
    params = unpack_int4_params(params)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    if rope_table is None:
        rope_table = make_rope_table(cfg, T + 1)
    h = params["embed"][ids]
    rope = rope_table[positions]
    cos, sin = rope[:, :, 0, :], rope[:, :, 1, :]
    i = jnp.arange(T, dtype=jnp.int32)
    mask = jnp.broadcast_to(i[None, :, None] >= i[None, None, :], (B, T, T))

    def layer(h, p):
        def attn_block(x):
            qp, kp, vp = linear_multi(x, (p["wq"], p["wk"], p["wv"]), cfg.act_quant)
            q = qp.reshape(B, T, cfg.num_heads, cfg.head_dim)
            k = kp.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
            v = vp.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
            if cfg.qk_norm:
                q = head_layer_norm(q, p["q_norm_scale"], p["q_norm_bias"], cfg.qk_norm_eps)
                k = head_layer_norm(k, p["k_norm_scale"], p["k_norm_bias"], cfg.qk_norm_eps)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            return linear(_attend(q, k, v, mask).reshape(B, T, cfg.q_dim),
                          p["wo"], cfg.act_quant)

        def mlp_block(x):
            g, u = linear_multi(x, (p["w_gate"], p["w_up"]), cfg.act_quant)
            return linear(jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u,
                          p["w_down"], cfg.act_quant)

        if cfg.swin_norm:
            h1 = h + rms_norm(attn_block(h), p["attn_norm"], cfg.norm_eps)
            h2 = h1 + rms_norm(mlp_block(h1), p["mlp_norm"], cfg.norm_eps)
        else:
            h1 = h + attn_block(rms_norm(h, p["attn_norm"], cfg.norm_eps))
            h2 = h1 + mlp_block(rms_norm(h1, p["mlp_norm"], cfg.norm_eps))
        return h2, h2.astype(jnp.float32)

    h, per_layer = jax.lax.scan(layer, h, params["layers"])
    h = rms_norm(h, params["final_norm"], cfg.norm_eps)
    if cfg.tie_word_embeddings:
        logits = jnp.einsum("btd,vd->btv", h, params["embed"],
                            preferred_element_type=jnp.float32)
    else:
        logits = linear(h, params["lm_head"], cfg.act_quant)
    return per_layer, logits.astype(jnp.float32)


def fidelity_metrics(
    params_ref: PyTree,
    params_q: PyTree,
    cfg: DecoderConfig,
    ids: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Per-layer relative MSE + end-logits KL of a quantized pytree vs the
    bf16 reference on the same token inputs.

    Returns {"rel_mse": [n_layers], "kl": scalar, "top1_agree": scalar}.
    top1_agree = fraction of positions whose argmax token survives
    quantization (the greedy-decode invariance proxy).

    Runs as ONE jit: packed-int4 leaves must cross the jit boundary packed
    (s4 arrays as jit inputs trip the axon tunnel's "Recursively calling
    jit" bug — see quantize_weights) and the in-jit unpack is where the
    production path does it too.
    """

    @jax.jit
    def _metrics(params_ref, params_q, ids):
        h_ref, logits_ref = layer_outputs(params_ref, cfg, ids)
        h_q, logits_q = layer_outputs(params_q, cfg, ids)
        return h_ref, logits_ref, h_q, logits_q

    h_ref, logits_ref, h_q, logits_q = _metrics(params_ref, params_q, ids)
    num = jnp.sum((h_q - h_ref) ** 2, axis=(1, 2, 3))
    den = jnp.maximum(jnp.sum(h_ref**2, axis=(1, 2, 3)), 1e-20)
    rel_mse = num / den  # [n_layers]

    logp_ref = jax.nn.log_softmax(logits_ref, axis=-1)
    logp_q = jax.nn.log_softmax(logits_q, axis=-1)
    p_ref = jnp.exp(logp_ref)
    kl = jnp.mean(jnp.sum(p_ref * (logp_ref - logp_q), axis=-1))
    top1 = jnp.mean(
        (jnp.argmax(logits_ref, -1) == jnp.argmax(logits_q, -1)).astype(jnp.float32)
    )
    return {"rel_mse": rel_mse, "kl": kl, "top1_agree": top1}


def compare_quant_variants(
    params_bf16: PyTree,
    cfg: DecoderConfig,
    ids: jnp.ndarray,
    *,
    variants: Optional[Dict[str, dict]] = None,
) -> Dict[str, Dict[str, Any]]:
    """Quantize ``params_bf16`` under each named variant and report fidelity.

    Default variants: int8 (W8A16), int4_equil (the production fold),
    int4_raw (equilibrate=False — the ablation the equilibration claim is
    judged against), int4_a8 (W4A8 — int8 activations on the int8 MXU, the
    batch-serving trade; a variant's "act_quant" key overrides cfg's).
    Values are python floats/lists, printable as JSON.
    """
    import dataclasses as _dc

    from .transformer import quantize_weights

    if variants is None:
        variants = {
            "int8": dict(bits=8),
            "int4_equil": dict(bits=4, head_bits=8, equilibrate=True),
            "int4_raw": dict(bits=4, head_bits=8, equilibrate=False),
            "int4_a8": dict(bits=4, head_bits=8, equilibrate=True,
                            act_quant="int8"),
        }
    out: Dict[str, Dict[str, Any]] = {}
    for name, kw in variants.items():
        kw = dict(kw)
        cfg_v = cfg
        act = kw.pop("act_quant", None)
        if act is not None:
            # act_quant only affects quantized-dict weights in linear_multi,
            # so the bf16 reference forward inside fidelity_metrics is
            # unchanged by this override
            cfg_v = _dc.replace(cfg, act_quant=act)
        # jitted quantize: eager execution dispatches hundreds of small ops
        # (ruinous through a ~20ms-latency device tunnel) and the fused
        # form never materializes intermediate fp32 copies of every weight
        pq = jax.jit(lambda p: quantize_weights(p, config=cfg_v, **kw))(
            params_bf16
        )
        m = fidelity_metrics(params_bf16, pq, cfg_v, ids)
        out[name] = {
            "kl": float(m["kl"]),
            "top1_agree": float(m["top1_agree"]),
            "rel_mse_per_layer": [float(v) for v in m["rel_mse"]],
            "rel_mse_last": float(m["rel_mse"][-1]),
        }
    return out
