"""VQ tokenizer tests.

The encoder path is parity-checked against HuggingFace's ChameleonVQVAE
(which shares the taming architecture and parameter names with the
reference's vendored VQGAN); the decoder reuses the same verified blocks.
Decode is additionally checked for shape/range and encode-decode consistency.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sjd_tpu.models.vq import (
    VQConfig,
    codebook_encode,
    codebook_lookup,
    decode,
    encode,
    init_vq_params,
    port_vqgan,
)
from sjd_tpu.utils.port import state_dict_to_numpy

torch = pytest.importorskip("torch")

TINY = VQConfig(
    ch=32,
    ch_mult=(1, 2),
    num_res_blocks=1,
    resolution=32,
    attn_resolutions=(16,),
    z_channels=32,
    embed_dim=8,
    n_embed=32,
)


def _hf_vqvae():
    from transformers import ChameleonVQVAEConfig
    from transformers.models.chameleon.modeling_chameleon import ChameleonVQVAE

    cfg = ChameleonVQVAEConfig(
        embed_dim=8,
        num_embeddings=32,
        latent_channels=32,
        base_channels=32,
        channel_multiplier=[1, 2],
        num_res_blocks=1,
        resolution=32,
        attn_resolutions=[16],
        double_latent=False,
    )
    torch.manual_seed(0)
    return ChameleonVQVAE(cfg).eval()


def test_encoder_parity_with_hf_chameleon_vqvae():
    hf = _hf_vqvae()
    params = port_vqgan(state_dict_to_numpy(hf.state_dict()), TINY, style="taming")

    rs = np.random.RandomState(0)
    img = rs.randn(2, 3, 32, 32).astype(np.float32) * 0.5

    with torch.no_grad():
        q, _, ids_hf = hf.encode(torch.tensor(img))
    ids_mine = encode(params, TINY, jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_array_equal(
        np.asarray(ids_mine).reshape(-1), ids_hf.numpy().reshape(-1)
    )


def test_decode_shapes_and_finiteness():
    params = init_vq_params(jax.random.PRNGKey(0), TINY)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16 * 16), 0, TINY.n_embed)
    out = decode(params, TINY, ids, (16, 16))
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_codebook_roundtrip():
    """lookup(encode(z)) must reproduce the nearest codebook entries; with
    l2 normalization the llamagen convention (vq_model.py:218-268) holds."""
    for l2 in (False, True):
        cfg = VQConfig(
            ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32,
            z_channels=32, embed_dim=8, n_embed=64, l2_norm_codebook=l2,
        )
        params = init_vq_params(jax.random.PRNGKey(2), cfg)
        cb = params["codebook"]
        ids = jnp.arange(12)[None, :].astype(jnp.int32)
        z = codebook_lookup(cfg, cb, ids, (3, 4))
        back = codebook_encode(cfg, cb, z)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(ids))


def test_upsample_matches_torch():
    """nearest x2 + conv == torch interpolate+conv (decoder-only op that the
    HF encoder parity can't cover)."""
    import torch.nn.functional as F

    from sjd_tpu.models.vq.taming import upsample

    rs = np.random.RandomState(1)
    x = rs.randn(1, 6, 5, 4).astype(np.float32)  # NCHW
    w = rs.randn(6, 6, 3, 3).astype(np.float32)  # OIHW
    b = rs.randn(6).astype(np.float32)

    with torch.no_grad():
        up = F.interpolate(torch.tensor(x), scale_factor=2.0, mode="nearest")
        want = F.conv2d(up, torch.tensor(w), torch.tensor(b), padding=1).numpy()

    p = {"conv_w": jnp.asarray(w.transpose(2, 3, 1, 0)), "conv_b": jnp.asarray(b)}
    got = upsample(p, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5
    )


def test_llamagen_full_roundtrip_shapes():
    """VQ-16-style config at toy size: ids -> pixels at x16 upsampling."""
    cfg = VQConfig(
        ch=32, ch_mult=(1, 1, 2, 2, 4), num_res_blocks=1, resolution=64,
        z_channels=32, embed_dim=8, n_embed=64, l2_norm_codebook=True,
    )
    params = init_vq_params(jax.random.PRNGKey(3), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 4 * 4), 0, 64)
    out = decode(params, cfg, ids, (4, 4))
    assert out.shape == (1, 64, 64, 3)


def test_emu3_random_init_decode_encode_run():
    """Checkpoint-free Emu3 VQ fallback (loader parity with the other
    families): random-init params decode ids -> pixels and encode back."""
    import numpy as np

    from sjd_tpu.models.vq.emu3_vq import Emu3VQConfig, decode, encode
    from sjd_tpu.models.vq.emu3_port import init_emu3_vq_params

    cfg = Emu3VQConfig(codebook_size=64, embed_dim=4, z_channels=4, ch=32,
                       ch_mult=(1, 2), num_res_blocks=1, attn_levels=(1,),
                       temporal_downsample_factor=4)
    params = init_emu3_vq_params(0, cfg)
    ids = np.random.RandomState(0).randint(0, 64, (1, 6, 5))
    px = decode(params, cfg, jnp.asarray(ids))
    assert px.shape == (1, 12, 10, 3)
    toks = encode(params, cfg, jnp.asarray(
        np.random.RandomState(1).randn(1, 16, 16, 3).astype(np.float32) * 0.3))
    assert toks.shape == (1, 8, 8)
    assert int(jnp.max(toks)) < 64 and int(jnp.min(toks)) >= 0
