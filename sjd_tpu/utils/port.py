"""Checkpoint porting: torch/HF state dicts -> sjd_tpu parameter pytrees.

Covers the four backbone families the reference loads
(model_wrappers/model_loader.py):
  * Chameleon / Lumina-mGPT and Anole — HF naming with per-head qk-norm
    (lumina_mgpt/model/chameleon/modeling_chameleon.py:198-275)
  * Emu3 — LLaMA naming with GQA (emu3/mllm/modeling_emu3.py)
  * LlamaGen — gpt-fast naming with a fused wqkv and *interleaved-pair* RoPE
    (llamagen/llamagen.py:244-247, 458-473); the q/k projections are
    row-permuted to this repo's split-half RoPE convention so logits match.

Input is a {name: numpy array} mapping — call `state_dict_to_numpy` on a
torch state dict first (keeps torch out of the JAX path).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

import jax.numpy as jnp

from ..models.transformer import DecoderConfig


def state_dict_to_numpy(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu()
            # only FLOATING tensors go through float32 (numpy has no bf16);
            # blanket .float() silently destroyed integer/bool buffers
            # (codebook usage counters, position ids) in ported state dicts
            if v.is_floating_point():
                v = v.float()
            v = v.numpy()
        out[k] = np.asarray(v)
    return out


def _interleaved_to_splithalf_rows(w: np.ndarray, n_heads: int, head_dim: int) -> np.ndarray:
    """Permute a [out, in] projection's output rows so that a checkpoint
    trained with interleaved-pair RoPE (rotate (2i, 2i+1), LlamaGen/Meta
    convention) produces identical attention under split-half RoPE
    (rotate (i, i + D/2), HF/LLaMA convention)."""
    out_dim, in_dim = w.shape
    assert out_dim == n_heads * head_dim
    idx = np.arange(head_dim)
    # split-half row j reads interleaved row: 2j for the first half,
    # 2(j - D/2) + 1 for the second half
    perm = np.where(idx < head_dim // 2, 2 * idx, 2 * (idx - head_dim // 2) + 1)
    full = (np.arange(n_heads)[:, None] * head_dim + perm[None, :]).reshape(-1)
    return w[full]


def _stack(arrs, dtype):
    return jnp.asarray(np.stack(arrs), dtype=dtype)


def port_hf_llama_like(
    sd: Mapping[str, np.ndarray],
    cfg: DecoderConfig,
    *,
    prefix: str = "model.",
) -> dict:
    """HF LLaMA-family naming (covers Chameleon, Anole, Emu3).

    Handles both qk-norm parameter layouts: the vendored
    ChameleonLayerNorm's [model_parallel_size, head_dim] (repeated across
    heads per shard, modeling_chameleon.py:206-218) and upstream HF's
    [num_heads, head_dim].
    """
    n, H, Hkv, D = cfg.num_layers, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    dt = cfg.dtype

    def qknorm(name: str, i: int, heads: int) -> np.ndarray:
        w = np.asarray(sd[f"{prefix}layers.{i}.self_attn.{name}"])
        w = w.reshape(-1, D)
        if w.shape[0] != heads:
            assert heads % w.shape[0] == 0, (w.shape, heads)
            w = np.repeat(w, heads // w.shape[0], axis=0)
        return w

    layers: Dict[str, Any] = {
        "attn_norm": _stack(
            [sd[f"{prefix}layers.{i}.input_layernorm.weight"] for i in range(n)], dt
        ),
        "wq": _stack(
            [sd[f"{prefix}layers.{i}.self_attn.q_proj.weight"] for i in range(n)], dt
        ),
        "wk": _stack(
            [sd[f"{prefix}layers.{i}.self_attn.k_proj.weight"] for i in range(n)], dt
        ),
        "wv": _stack(
            [sd[f"{prefix}layers.{i}.self_attn.v_proj.weight"] for i in range(n)], dt
        ),
        "wo": _stack(
            [sd[f"{prefix}layers.{i}.self_attn.o_proj.weight"] for i in range(n)], dt
        ),
        "mlp_norm": _stack(
            [sd[f"{prefix}layers.{i}.post_attention_layernorm.weight"] for i in range(n)],
            dt,
        ),
        "w_gate": _stack(
            [sd[f"{prefix}layers.{i}.mlp.gate_proj.weight"] for i in range(n)], dt
        ),
        "w_up": _stack(
            [sd[f"{prefix}layers.{i}.mlp.up_proj.weight"] for i in range(n)], dt
        ),
        "w_down": _stack(
            [sd[f"{prefix}layers.{i}.mlp.down_proj.weight"] for i in range(n)], dt
        ),
    }
    if cfg.qk_norm:
        layers["q_norm_scale"] = _stack(
            [qknorm("q_norm.weight", i, H) for i in range(n)], dt
        )
        layers["q_norm_bias"] = _stack(
            [qknorm("q_norm.bias", i, H) for i in range(n)], dt
        )
        layers["k_norm_scale"] = _stack(
            [qknorm("k_norm.weight", i, Hkv) for i in range(n)], dt
        )
        layers["k_norm_bias"] = _stack(
            [qknorm("k_norm.bias", i, Hkv) for i in range(n)], dt
        )

    params = {
        "embed": jnp.asarray(sd[f"{prefix}embed_tokens.weight"], dt),
        "layers": layers,
        "final_norm": jnp.asarray(sd[f"{prefix}norm.weight"], dt),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(sd["lm_head.weight"], dt)
    return params


def port_llamagen(sd: Mapping[str, np.ndarray], cfg: DecoderConfig) -> tuple[dict, dict]:
    """gpt-fast naming (llamagen/llamagen.py). Returns (decoder_params,
    cond_params). Splits the fused wqkv and converts the RoPE convention."""
    n, H, Hkv, D = cfg.num_layers, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    dt = cfg.dtype
    q_dim, kv_dim = H * D, Hkv * D

    wq, wk, wv, wo = [], [], [], []
    a_norm, m_norm, w1, w2, w3 = [], [], [], [], []
    for i in range(n):
        qkv = np.asarray(sd[f"layers.{i}.attention.wqkv.weight"])  # [q+2kv, in]
        q, k, v = np.split(qkv, [q_dim, q_dim + kv_dim], axis=0)
        q = _interleaved_to_splithalf_rows(q, H, D)
        k = _interleaved_to_splithalf_rows(k, Hkv, D)
        wq.append(q)
        wk.append(k)
        wv.append(v)
        wo.append(np.asarray(sd[f"layers.{i}.attention.wo.weight"]))
        a_norm.append(sd[f"layers.{i}.attention_norm.weight"])
        m_norm.append(sd[f"layers.{i}.ffn_norm.weight"])
        w1.append(np.asarray(sd[f"layers.{i}.feed_forward.w1.weight"]))
        w3.append(np.asarray(sd[f"layers.{i}.feed_forward.w3.weight"]))
        w2.append(np.asarray(sd[f"layers.{i}.feed_forward.w2.weight"]))

    params = {
        "embed": jnp.asarray(sd["tok_embeddings.weight"], dt),
        "layers": {
            "attn_norm": _stack(a_norm, dt),
            "wq": _stack(wq, dt),
            "wk": _stack(wk, dt),
            "wv": _stack(wv, dt),
            "wo": _stack(wo, dt),
            "mlp_norm": _stack(m_norm, dt),
            "w_gate": _stack(w1, dt),
            "w_up": _stack(w3, dt),
            "w_down": _stack(w2, dt),
        },
        "final_norm": jnp.asarray(sd["norm.weight"], dt),
        "lm_head": jnp.asarray(sd["output.weight"], dt),
    }

    cond: dict = {}
    if "cls_embedding.embedding_table.weight" in sd:
        cond = {
            "kind": "c2i",
            "label_table": jnp.asarray(
                sd["cls_embedding.embedding_table.weight"], jnp.float32
            ),
        }
    elif "cls_embedding.cap_proj.fc1.weight" in sd:
        cond = {
            "kind": "t2i",
            "fc1": jnp.asarray(np.asarray(sd["cls_embedding.cap_proj.fc1.weight"]).T,
                               jnp.float32),
            "fc2": jnp.asarray(np.asarray(sd["cls_embedding.cap_proj.fc2.weight"]).T,
                               jnp.float32),
            "uncond_embedding": jnp.asarray(
                sd["cls_embedding.uncond_embedding"], jnp.float32
            ),
        }
    return params, cond


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt/.pth/.safetensors/.bin file into numpy arrays, accepting the
    DDP/deepspeed/plain layouts the reference handles (test_llamagen.py:92-99)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "module", "state_dict"):
        if isinstance(blob, dict) and key in blob:
            blob = blob[key]
            break
    return state_dict_to_numpy(blob)
