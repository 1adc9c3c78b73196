"""Synthetic torch-layout checkpoints for the on-disk checkpoint drill.

Builds random state dicts with the EXACT key names and tensor layouts the
reference checkpoints use — HF LLaMA-family (Chameleon/Anole/Emu3,
lumina_mgpt/model/chameleon/modeling_chameleon.py naming), gpt-fast
(llamagen/llamagen.py), taming/LlamaGen VQGAN — and writes them to disk in
the real file layouts (sharded safetensors, pytorch_model*.bin, .pt with
DDP "module"/deepspeed "model" nesting per test_llamagen.py:92-99), so the
loaders' ckpt_dir/vq_ckpt branches (sjd_tpu/loader.py + utils/port.py) are
exercised end-to-end in the default suite instead of first running on
checkpoint day."""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _r(rs, *shape, scale=0.05, shift=0.0):
    return (rs.randn(*shape) * scale + shift).astype(np.float32)


# ---------------------------------------------------------------------------
# decoder state dicts
# ---------------------------------------------------------------------------


def synth_hf_llama_state_dict(cfg, seed=0, qk_layout="flat",
                              prefix="model.") -> Dict[str, np.ndarray]:
    """HF LLaMA-family naming (Chameleon / Anole / Emu3).

    qk_layout (only with cfg.qk_norm): "flat" = the vendored
    ChameleonLayerNorm's [head_dim] mp_size=1 layout (repeated across heads
    by the port, modeling_chameleon.py:206-218); "per_head" = upstream HF's
    [num_heads, head_dim]."""
    rs = np.random.RandomState(seed)
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    hid, ff = cfg.hidden_size, cfg.intermediate_size
    sd = {
        f"{prefix}embed_tokens.weight": _r(rs, cfg.vocab_size, hid),
        f"{prefix}norm.weight": _r(rs, hid, shift=1.0),
    }
    for i in range(cfg.num_layers):
        L = f"{prefix}layers.{i}."
        sd[L + "input_layernorm.weight"] = _r(rs, hid, shift=1.0)
        sd[L + "post_attention_layernorm.weight"] = _r(rs, hid, shift=1.0)
        sd[L + "self_attn.q_proj.weight"] = _r(rs, H * D, hid)
        sd[L + "self_attn.k_proj.weight"] = _r(rs, Hkv * D, hid)
        sd[L + "self_attn.v_proj.weight"] = _r(rs, Hkv * D, hid)
        sd[L + "self_attn.o_proj.weight"] = _r(rs, hid, H * D)
        sd[L + "mlp.gate_proj.weight"] = _r(rs, ff, hid)
        sd[L + "mlp.up_proj.weight"] = _r(rs, ff, hid)
        sd[L + "mlp.down_proj.weight"] = _r(rs, hid, ff)
        if cfg.qk_norm:
            qs = (D,) if qk_layout == "flat" else (H, D)
            ks = (D,) if qk_layout == "flat" else (Hkv, D)
            sd[L + "self_attn.q_norm.weight"] = _r(rs, *qs, shift=1.0)
            sd[L + "self_attn.q_norm.bias"] = _r(rs, *qs)
            sd[L + "self_attn.k_norm.weight"] = _r(rs, *ks, shift=1.0)
            sd[L + "self_attn.k_norm.bias"] = _r(rs, *ks)
    if not cfg.tie_word_embeddings:
        sd["lm_head.weight"] = _r(rs, cfg.vocab_size, hid)
    return sd


def synth_llamagen_state_dict(cfg, seed=0, num_classes=10) -> Dict[str, np.ndarray]:
    """gpt-fast naming with the fused wqkv (llamagen/llamagen.py) and a c2i
    LabelEmbedder (+1 CFG-uncond row)."""
    rs = np.random.RandomState(seed)
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    hid, ff = cfg.hidden_size, cfg.intermediate_size
    sd = {
        "tok_embeddings.weight": _r(rs, cfg.vocab_size, hid),
        "norm.weight": _r(rs, hid, shift=1.0),
        "output.weight": _r(rs, cfg.vocab_size, hid),
        "cls_embedding.embedding_table.weight": _r(rs, num_classes + 1, hid),
    }
    for i in range(cfg.num_layers):
        L = f"layers.{i}."
        sd[L + "attention.wqkv.weight"] = _r(rs, (H + 2 * Hkv) * D, hid)
        sd[L + "attention.wo.weight"] = _r(rs, hid, H * D)
        sd[L + "attention_norm.weight"] = _r(rs, hid, shift=1.0)
        sd[L + "ffn_norm.weight"] = _r(rs, hid, shift=1.0)
        sd[L + "feed_forward.w1.weight"] = _r(rs, ff, hid)
        sd[L + "feed_forward.w3.weight"] = _r(rs, ff, hid)
        sd[L + "feed_forward.w2.weight"] = _r(rs, hid, ff)
    return sd


# ---------------------------------------------------------------------------
# VQGAN state dict (taming / llamagen naming; mirrors models/vq/port.py)
# ---------------------------------------------------------------------------


def synth_vqgan_state_dict(cfg, seed=0, style="taming") -> Dict[str, np.ndarray]:
    rs = np.random.RandomState(seed)
    sd: Dict[str, np.ndarray] = {}
    n, nrb, ch = cfg.num_resolutions, cfg.num_res_blocks, cfg.ch

    def conv(name, co, ci, k):
        sd[f"{name}.weight"] = _r(rs, co, ci, k, k)
        sd[f"{name}.bias"] = np.zeros(co, np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = _r(rs, c, shift=1.0)
        sd[f"{name}.bias"] = _r(rs, c)

    def res(base, ci, co):
        norm(f"{base}.norm1", ci)
        conv(f"{base}.conv1", co, ci, 3)
        norm(f"{base}.norm2", co)
        conv(f"{base}.conv2", co, co, 3)
        if ci != co:
            conv(f"{base}.nin_shortcut", co, ci, 1)

    def attn(base, c):
        norm(f"{base}.norm", c)
        for nm in ("q", "k", "v", "proj_out"):
            conv(f"{base}.{nm}", c, c, 1)

    if style == "taming":
        enc_res = lambda i, j: f"encoder.down.{i}.block.{j}"  # noqa: E731
        enc_attn = lambda i, j: f"encoder.down.{i}.attn.{j}"  # noqa: E731
        enc_down = lambda i: f"encoder.down.{i}.downsample.conv"  # noqa: E731
        dec_res = lambda idx, j: f"decoder.up.{n - 1 - idx}.block.{j}"  # noqa: E731
        dec_attn = lambda idx, j: f"decoder.up.{n - 1 - idx}.attn.{j}"  # noqa: E731
        dec_up = lambda idx: f"decoder.up.{n - 1 - idx}.upsample.conv"  # noqa: E731
        mid_names = {"b1": "block_1", "attn": "attn_1", "b2": "block_2"}
    else:  # llamagen
        enc_res = lambda i, j: f"encoder.conv_blocks.{i}.res.{j}"  # noqa: E731
        enc_attn = lambda i, j: f"encoder.conv_blocks.{i}.attn.{j}"  # noqa: E731
        enc_down = lambda i: f"encoder.conv_blocks.{i}.downsample.conv"  # noqa: E731
        dec_res = lambda idx, j: f"decoder.conv_blocks.{idx}.res.{j}"  # noqa: E731
        dec_attn = lambda idx, j: f"decoder.conv_blocks.{idx}.attn.{j}"  # noqa: E731
        dec_up = lambda idx: f"decoder.conv_blocks.{idx}.upsample.conv"  # noqa: E731
        mid_names = {"b1": "0", "attn": "1", "b2": "2"}

    in_mult = (1,) + tuple(cfg.ch_mult)
    # encoder
    conv("encoder.conv_in", ch, cfg.in_channels, 3)
    for i in range(n):
        cin, cout = ch * in_mult[i], ch * cfg.ch_mult[i]
        for j in range(nrb):
            res(enc_res(i, j), cin if j == 0 else cout, cout)
        if cfg.has_attn(i):
            for j in range(nrb):
                attn(enc_attn(i, j), cout)
        if i != n - 1:
            conv(enc_down(i), cout, cout, 3)
    mid = ch * cfg.ch_mult[-1]
    res(f"encoder.mid.{mid_names['b1']}", mid, mid)
    attn(f"encoder.mid.{mid_names['attn']}", mid)
    res(f"encoder.mid.{mid_names['b2']}", mid, mid)
    norm("encoder.norm_out", mid)
    conv("encoder.conv_out", cfg.z_channels, mid, 3)

    # decoder (idx lowest-res first, like models/vq/taming.py init)
    conv("decoder.conv_in", mid, cfg.z_channels, 3)
    res(f"decoder.mid.{mid_names['b1']}", mid, mid)
    attn(f"decoder.mid.{mid_names['attn']}", mid)
    res(f"decoder.mid.{mid_names['b2']}", mid, mid)
    block_in = mid
    for idx, i in enumerate(reversed(range(n))):
        cout = ch * cfg.ch_mult[i]
        for j in range(nrb + 1):
            res(dec_res(idx, j), block_in if j == 0 else cout, cout)
        if cfg.has_attn(i):
            for j in range(nrb + 1):
                attn(dec_attn(idx, j), cout)
        if i != 0:
            conv(dec_up(idx), cout, cout, 3)
        block_in = cout
    norm("decoder.norm_out", block_in)
    conv("decoder.conv_out", cfg.out_ch, block_in, 3)

    sd["quantize.embedding.weight"] = _r(rs, cfg.n_embed, cfg.embed_dim)
    conv("quant_conv", cfg.embed_dim, cfg.z_channels, 1)
    conv("post_quant_conv", cfg.z_channels, cfg.embed_dim, 1)
    return sd


# ---------------------------------------------------------------------------
# on-disk layouts (the three the reference handles, test_llamagen.py:92-99)
# ---------------------------------------------------------------------------


def save_sharded_safetensors(sd, d, shards=2):
    from safetensors.numpy import save_file

    os.makedirs(d, exist_ok=True)
    keys = sorted(sd)
    for s in range(shards):
        part = {k: sd[k] for k in keys[s::shards]}
        save_file(
            part,
            os.path.join(d, f"model-{s + 1:05d}-of-{shards:05d}.safetensors"),
        )


def save_torch_bins(sd, d, shards=2):
    import torch

    os.makedirs(d, exist_ok=True)
    keys = sorted(sd)
    for s in range(shards):
        part = {k: torch.from_numpy(sd[k]) for k in keys[s::shards]}
        name = (
            "pytorch_model.bin" if shards == 1
            else f"pytorch_model-{s + 1:05d}-of-{shards:05d}.bin"
        )
        torch.save(part, os.path.join(d, name))


def save_torch_pt(sd, path, nest=None):
    """Single .pt file; nest="module" (DDP) / "model" (reference .pt
    checkpoints) / "state_dict" wraps the dict one level."""
    import torch

    blob = {k: torch.from_numpy(v) for k, v in sd.items()}
    if nest:
        blob = {nest: blob}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save(blob, path)


# ---------------------------------------------------------------------------
# fake-but-functional tokenizers (the user-supplied seam; real tokenizer
# files are oracle-tested separately in test_vocab_translation / _emu3_)
# ---------------------------------------------------------------------------


class ChameleonFakeTokenizer:
    """IMGIMG vocab covering the FULL codebook as a permutation into the
    image-BPE span [4, 4+n_embed) — every grammar-permitted image token is
    mappable, like the real Chameleon tokenizer — plus deterministic text
    encoding into a text-id range."""

    def __init__(self, n_embed=8192, seed=3):
        from sjd_tpu.data.vocab_translation import image_token_name

        rs = np.random.RandomState(seed)
        perm = rs.permutation(n_embed)
        self._vocab = {
            image_token_name(i): int(4 + p) for i, p in enumerate(perm)
        }

    def get_vocab(self):
        return dict(self._vocab)

    def encode(self, text):
        return [9000 + (ord(c) % 64) for c in text[:12]]


class Emu3FakeTokenizer:
    def encode(self, text):
        return [1000 + (ord(c) % 500) for c in text[:12]]
