"""Emu3VisionVQ parity: the JAX NHWC implementation must reproduce the
reference torch module (random weights, tiny config) bit-for-bit-ish on both
decode (ids -> pixels) and encode (pixels -> ids).

The reference module is imported read-only as a test oracle; no reference
code ships in this repo.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from sjd_tpu.models.vq.emu3_port import port_emu3_vq
from sjd_tpu.models.vq.emu3_vq import Emu3VQConfig, decode, encode
from sjd_tpu.utils.port import state_dict_to_numpy


@pytest.fixture(scope="module")
def ref_model():
    from emu3.tokenizer.configuration_emu3visionvq import Emu3VisionVQConfig
    from emu3.tokenizer.modeling_emu3visionvq import Emu3VisionVQModel

    cfg = Emu3VisionVQConfig(
        codebook_size=64, embed_dim=4, z_channels=4, ch=32, ch_mult=[1, 2],
        num_res_blocks=1, attn_resolutions=[1], temporal_downsample_factor=4,
    )
    torch.manual_seed(0)
    return Emu3VisionVQModel(cfg).eval()


CFG = Emu3VQConfig(
    codebook_size=64, embed_dim=4, z_channels=4, ch=32, ch_mult=(1, 2),
    num_res_blocks=1, attn_levels=(1,), temporal_downsample_factor=4,
)


def test_decode_parity(ref_model):
    params = port_emu3_vq(state_dict_to_numpy(ref_model.state_dict()), CFG)
    rs = np.random.RandomState(0)
    ids = rs.randint(0, 64, (2, 6, 5))

    with torch.no_grad():
        want = ref_model.decode(torch.tensor(ids)).numpy()  # [B, C, H, W]
    got = decode(params, CFG, jnp.asarray(ids))  # [B, H, W, C]
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-3, atol=2e-3
    )


def test_encode_parity(ref_model):
    params = port_emu3_vq(state_dict_to_numpy(ref_model.state_dict()), CFG)
    rs = np.random.RandomState(1)
    img = rs.randn(2, 3, 16, 16).astype(np.float32) * 0.3

    with torch.no_grad():
        want = ref_model.encode(torch.tensor(img)).numpy()  # [B, h, w]
    got = encode(params, CFG, jnp.asarray(img.transpose(0, 2, 3, 1)))
    agree = (np.asarray(got) == want).mean()
    assert agree > 0.97, agree  # argmin ties may differ at fp tolerance


def test_random_init_structure_matches_ported(ref_model):
    """init_emu3_vq_params builds the EXACT pytree the checkpoint port
    produces (structure and shapes), so the checkpoint-free loader fallback
    can never drift from the real model layout."""
    from sjd_tpu.models.vq.emu3_port import init_emu3_vq_params

    ported = port_emu3_vq(state_dict_to_numpy(ref_model.state_dict()), CFG)
    rand = init_emu3_vq_params(0, CFG)
    assert jax.tree_util.tree_structure(ported) == jax.tree_util.tree_structure(rand)
    assert jax.tree.map(lambda t: t.shape, ported) == jax.tree.map(
        lambda t: t.shape, rand
    )
