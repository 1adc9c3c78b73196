"""Numerical parity of the generic decoder against HuggingFace reference
implementations (random tiny configs, fp32, CPU):

  * Chameleon (qk-norm, GQA, 1-D RoPE) — the Lumina-mGPT / Anole backbone
  * LLaMA (GQA, rope theta 1e6)        — the Emu3 backbone architecture

This validates both the weight-porting layout (utils/port.py) and the
transformer numerics (rms-norm, per-head qk layer-norm, RoPE convention,
SwiGLU) in one shot.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sjd_tpu.models import DecoderConfig, forward_train
from sjd_tpu.utils.port import port_hf_llama_like, state_dict_to_numpy

torch = pytest.importorskip("torch")


def _compare(hf_logits, params, cfg, ids):
    pos = jnp.arange(ids.shape[1], dtype=jnp.int32)[None, :].repeat(ids.shape[0], 0)
    mine = forward_train(params, cfg, jnp.asarray(ids), pos, remat=False)
    np.testing.assert_allclose(
        np.asarray(mine), hf_logits, rtol=2e-4, atol=2e-4
    )


def test_chameleon_parity():
    from transformers import ChameleonConfig, ChameleonForConditionalGeneration

    hf_cfg = ChameleonConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        model_parallel_size=1,
        vocabulary_map={"<image>": 1},
        swin_norm=False,
    )
    torch.manual_seed(0)
    hf = ChameleonForConditionalGeneration(hf_cfg).eval()

    cfg = DecoderConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        qk_norm=True,
        dtype=jnp.float32,
        max_position_embeddings=256,
    )
    params = port_hf_llama_like(state_dict_to_numpy(hf.state_dict()), cfg)

    ids = np.random.RandomState(0).randint(0, 128, (2, 9))
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids)).logits.float().numpy()
    _compare(out, params, cfg, ids)


def test_chameleon_swin_norm_parity():
    from transformers import ChameleonConfig, ChameleonForConditionalGeneration

    hf_cfg = ChameleonConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=128,
        model_parallel_size=1,
        vocabulary_map={"<image>": 1},
        swin_norm=True,
    )
    torch.manual_seed(1)
    hf = ChameleonForConditionalGeneration(hf_cfg).eval()
    cfg = DecoderConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=4,
        head_dim=8,
        qk_norm=True,
        swin_norm=True,
        dtype=jnp.float32,
        max_position_embeddings=128,
    )
    params = port_hf_llama_like(state_dict_to_numpy(hf.state_dict()), cfg)
    ids = np.random.RandomState(1).randint(0, 96, (1, 7))
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids)).logits.float().numpy()
    _compare(out, params, cfg, ids)


def test_emu3_arch_parity_via_llama():
    """Emu3's backbone is LLaMA-with-GQA (emu3/mllm/modeling_emu3.py); verify
    the port path on HF LlamaForCausalLM with Emu3's rope theta."""
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=160,
        hidden_size=64,
        intermediate_size=160,
        num_hidden_layers=3,
        num_attention_heads=8,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=1_000_000.0,
        rms_norm_eps=1e-5,  # Emu3's value (configuration_emu3.py:69)
        attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = DecoderConfig(
        vocab_size=160,
        hidden_size=64,
        intermediate_size=160,
        num_layers=3,
        num_heads=8,
        num_kv_heads=2,
        head_dim=8,
        rope_theta=1_000_000.0,
        qk_norm=False,
        dtype=jnp.float32,
        max_position_embeddings=256,
    )
    params = port_hf_llama_like(state_dict_to_numpy(hf.state_dict()), cfg)
    ids = np.random.RandomState(2).randint(0, 160, (2, 11))
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids)).logits.float().numpy()
    _compare(out, params, cfg, ids)


def test_llamagen_rope_permutation_roundtrip():
    """The interleaved->split-half row permutation preserves attention:
    rotating with interleaved pairs then projecting == permuted projection
    rotated with split-half tables."""
    from sjd_tpu.utils.port import _interleaved_to_splithalf_rows

    rs = np.random.RandomState(3)
    H, D, d_in, T = 2, 8, 16, 5
    w = rs.randn(H * D, d_in).astype(np.float32)
    x = rs.randn(T, d_in).astype(np.float32)
    theta = 10000.0
    pos = np.arange(T)

    # interleaved-pair rotation (llamagen apply_rotary_emb, llamagen.py:458-473)
    q = (x @ w.T).reshape(T, H, D)
    half = D // 2
    freqs = 1.0 / theta ** (np.arange(0, half) / half)  # per pair
    ang = pos[:, None] * freqs[None]  # [T, D/2]
    qi = q.reshape(T, H, half, 2)
    cos, sin = np.cos(ang)[:, None], np.sin(ang)[:, None]
    rot_interleaved = np.stack(
        [qi[..., 0] * cos - qi[..., 1] * sin, qi[..., 1] * cos + qi[..., 0] * sin],
        axis=-1,
    ).reshape(T, H, D)

    # split-half rotation of the permuted projection (this repo's apply_rope)
    wp = _interleaved_to_splithalf_rows(w, H, D)
    q2 = (x @ wp.T).reshape(T, H, D)
    emb = np.concatenate([ang, ang], axis=-1)[:, None]  # [T, 1, D]
    rot_half = q2 * np.cos(emb) + np.concatenate(
        [-q2[..., half:], q2[..., :half]], axis=-1
    ) * np.sin(emb)

    # same rotation up to the same row permutation
    perm = np.where(np.arange(D) < half, 2 * np.arange(D), 2 * (np.arange(D) - half) + 1)
    np.testing.assert_allclose(
        rot_half, rot_interleaved[..., perm], rtol=1e-5, atol=1e-5
    )
