"""On-disk checkpoint drill (VERDICT r3 #1): execute the loaders'
ckpt_dir/vq_ckpt path end-to-end — synthetic torch-layout checkpoint files
on disk -> _load_sharded_state / load_torch_checkpoint -> port -> generate
-> PIL — for all four families and all three file layouts the reference
handles (sharded safetensors, pytorch_model*.bin, .pt with DDP "module" /
"model" nesting, test_llamagen.py:92-99). Each drill asserts smoke == False
and that the disk-ported params bit-match the in-memory port, so checkpoint
day is not the first-ever run of loader.py's file plumbing."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sjd_tpu.models import DecoderConfig
from sjd_tpu.models.vq import VQConfig

from ckpt_synth import (
    ChameleonFakeTokenizer,
    Emu3FakeTokenizer,
    save_sharded_safetensors,
    save_torch_bins,
    save_torch_pt,
    synth_hf_llama_state_dict,
    synth_llamagen_state_dict,
    synth_vqgan_state_dict,
)

# tiny shapes, REAL vocab layouts (grammar token ids must stay valid)
TINY_CHAMELEON = DecoderConfig(
    vocab_size=65536, hidden_size=16, intermediate_size=32, num_layers=2,
    num_heads=2, num_kv_heads=2, head_dim=8, qk_norm=True, dtype=jnp.float32,
    max_position_embeddings=512,
)
TINY_CHAMELEON_VQ = VQConfig(  # downsample factor 16 like the real VQGAN;
    # ch=32: GroupNorm(32) needs channel multiples of 32
    ch=32, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1, z_channels=32,
    embed_dim=16, n_embed=8192,
)


def assert_trees_equal(got, want):
    gl, gt = jax.tree.flatten(got)
    wl, wt = jax.tree.flatten(want)
    assert gt == wt, (gt, wt)
    for g, w in zip(gl, wl):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_lumina_disk_checkpoint_drill(tmp_path):
    """Sharded safetensors decoder + taming-style "state_dict"-nested .ckpt
    VQ + IMGIMG tokenizer -> smoke=False -> t2i generate -> 64px PIL."""
    from sjd_tpu.loader import load_lumina_mgpt
    from sjd_tpu.utils.port import port_hf_llama_like

    sd = synth_hf_llama_state_dict(TINY_CHAMELEON, seed=1, qk_layout="flat")
    ckpt_dir = str(tmp_path / "lumina")
    save_sharded_safetensors(sd, ckpt_dir, shards=2)
    vq_sd = synth_vqgan_state_dict(TINY_CHAMELEON_VQ, seed=2)
    vq_path = str(tmp_path / "vq" / "vqgan.ckpt")
    save_torch_pt(vq_sd, vq_path, nest="state_dict")

    model = load_lumina_mgpt(
        ckpt_dir=ckpt_dir, vq_ckpt=vq_path, target_size=64,
        model_cfg=TINY_CHAMELEON, vq_cfg=TINY_CHAMELEON_VQ,
        tokenizer=ChameleonFakeTokenizer(),
    )
    assert model.smoke is False, model.extras["smoke_reasons"]
    assert_trees_equal(model.params, port_hf_llama_like(sd, TINY_CHAMELEON))
    img = model.sample_fn("a photo of a cat", 0)
    assert img.size == (64, 64)


def test_emu3_disk_checkpoint_drill(tmp_path):
    """Sharded pytorch_model-*.bin decoder + sharded-safetensors VisionVQ
    dir + tokenizer -> smoke=False -> generate -> PIL."""
    from sjd_tpu.loader import load_emu3
    from sjd_tpu.models.vq.emu3_port import synth_emu3_vq_state_dict
    from sjd_tpu.models.vq.emu3_vq import Emu3VQConfig
    from sjd_tpu.utils.port import port_hf_llama_like

    cfg = DecoderConfig(
        vocab_size=184622, hidden_size=16, intermediate_size=32, num_layers=2,
        num_heads=2, num_kv_heads=2, head_dim=8, qk_norm=False,
        rope_theta=1_000_000.0, dtype=jnp.float32,
        max_position_embeddings=512,
    )
    sd = synth_hf_llama_state_dict(cfg, seed=3)
    ckpt_dir = str(tmp_path / "emu3")
    save_torch_bins(sd, ckpt_dir, shards=2)

    vq_cfg = Emu3VQConfig(ch=32, ch_mult=(1, 1), num_res_blocks=1,
                          z_channels=4, embed_dim=4, attn_levels=(1,))
    vq_sd = synth_emu3_vq_state_dict(4, vq_cfg)
    vq_dir = str(tmp_path / "emu3_vq")
    save_sharded_safetensors(vq_sd, vq_dir, shards=2)

    model = load_emu3(
        ckpt_dir=ckpt_dir, vq_ckpt_dir=vq_dir, h=2, w=2, quantize=False,
        model_cfg=cfg, vq_cfg=vq_cfg, tokenizer=Emu3FakeTokenizer(),
    )
    assert model.smoke is False, model.extras["smoke_reasons"]
    assert_trees_equal(model.params, port_hf_llama_like(sd, cfg))
    img = model.sample_fn("a landscape", 0)
    assert img.size == (2 * vq_cfg.spatial_factor,) * 2


def test_anole_disk_checkpoint_drill(tmp_path):
    """Single .pt with DDP "module" nesting (per-head qk-norm layout) +
    safetensors VQ file -> smoke=False -> image-only generate -> PIL."""
    from sjd_tpu.loader import load_anole
    from sjd_tpu.utils.port import port_hf_llama_like

    sd = synth_hf_llama_state_dict(TINY_CHAMELEON, seed=5,
                                   qk_layout="per_head")
    ckpt_dir = str(tmp_path / "anole")
    save_torch_pt(sd, os.path.join(ckpt_dir, "consolidated.pt"),
                  nest="module")
    from safetensors.numpy import save_file

    vq_sd = synth_vqgan_state_dict(TINY_CHAMELEON_VQ, seed=6)
    vq_path = str(tmp_path / "anole_vq.safetensors")
    save_file(vq_sd, vq_path)

    model = load_anole(
        ckpt_dir=ckpt_dir, vq_ckpt=vq_path, model_cfg=TINY_CHAMELEON,
        vq_cfg=TINY_CHAMELEON_VQ, tokenizer=ChameleonFakeTokenizer(),
        image_seq_length=16,  # 4x4 grid drill (real default 1024 = 32x32)
    )
    assert model.smoke is False, model.extras["smoke_reasons"]
    assert_trees_equal(model.params, port_hf_llama_like(sd, TINY_CHAMELEON))
    img = model.sample_fn("an apple", 0)
    assert img.size == (64, 64)  # 4x4 grid x f16


def test_llamagen_disk_checkpoint_drill(tmp_path):
    """.pt with the reference's "model" nesting (fused wqkv + interleaved
    RoPE conversion + c2i LabelEmbedder) + safetensors VQ -> smoke=False ->
    c2i generate -> PIL."""
    from sjd_tpu.loader import load_llamagen
    from sjd_tpu.utils.port import port_llamagen

    cfg = DecoderConfig(
        vocab_size=16384, hidden_size=16, intermediate_size=32, num_layers=2,
        num_heads=2, num_kv_heads=2, head_dim=8, rope_style="2d",
        rope_2d_cls_len=1, rope_2d_grid_side=4, dtype=jnp.float32,
        max_position_embeddings=128,
    )
    sd = synth_llamagen_state_dict(cfg, seed=7, num_classes=10)
    gpt_path = str(tmp_path / "llamagen" / "GPT-tiny.pt")
    save_torch_pt(sd, gpt_path, nest="model")
    from safetensors.numpy import save_file

    vq_cfg = VQConfig(ch=32, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
                      z_channels=32, embed_dim=8, n_embed=16384,
                      l2_norm_codebook=True)
    vq_sd = synth_vqgan_state_dict(vq_cfg, seed=8, style="llamagen")
    vq_path = str(tmp_path / "llamagen_vq.safetensors")
    save_file(vq_sd, vq_path)

    model = load_llamagen(
        gpt_ckpt=gpt_path, vq_ckpt=vq_path, latent_size=4,
        model_type="c2i", model_cfg=cfg, vq_cfg=vq_cfg,
    )
    assert model.smoke is False, model.extras["smoke_reasons"]
    want_params, want_cond = port_llamagen(sd, cfg)
    assert_trees_equal(model.params, want_params)
    assert_trees_equal(model.extras["cond"], want_cond)
    img = model.sample_fn("3", 0)
    assert img.size == (64, 64)  # 4x4 grid x f16


def test_three_file_layouts_load_identically(tmp_path):
    """The same state dict written as sharded safetensors, sharded
    pytorch_model-*.bin, and a "module"-nested .pt must load and port to
    bit-identical pytrees through _load_sharded_state."""
    from sjd_tpu.loader import _load_sharded_state
    from sjd_tpu.utils.port import port_hf_llama_like

    sd = synth_hf_llama_state_dict(TINY_CHAMELEON, seed=9, qk_layout="flat")
    d1, d2, d3 = (str(tmp_path / n) for n in ("st", "bin", "pt"))
    save_sharded_safetensors(sd, d1, shards=3)
    save_torch_bins(sd, d2, shards=2)
    save_torch_pt(sd, os.path.join(d3, "weights.pt"), nest="module")

    ported = [
        port_hf_llama_like(_load_sharded_state(d), TINY_CHAMELEON)
        for d in (d1, d2, d3)
    ]
    assert_trees_equal(ported[0], ported[1])
    assert_trees_equal(ported[0], ported[2])
    # and they match the in-memory port exactly
    assert_trees_equal(ported[0], port_hf_llama_like(sd, TINY_CHAMELEON))
