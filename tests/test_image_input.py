"""Image-conditioned prompting (i2i / freeform) and the vocab-translated
pixel roundtrip: pixels -> VQ encode -> bpe permute -> FlexAR block ->
grid -> codebook decode must reproduce the encoder's token grid exactly
(reference: item_processor.process_image :110-146 + convert_img2bp2, consumed
by inference_solver.generate(images=[...]) :299-353)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sjd_tpu.data.item_processor import (
    FlexARItemProcessor,
    IMAGE_END_ID,
    IMAGE_START_ID,
    NEW_LINE_ID,
    image_block_from_grid,
    image_grid_from_block,
)
from sjd_tpu.data.vocab_translation import (
    image_token_name,
    mapping_from_vocab,
)
from sjd_tpu.models.vq import VQConfig, decode as vq_decode, encode as vq_encode, init_vq_params

# real downsample factor (16) so the FlexAR grid layout applies; tiny widths
TINY_VQ = VQConfig(ch=32, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
                   z_channels=32, embed_dim=32, n_embed=64)


def shuffled_mapping(n_img=64, bpe_base=4, seed=7):
    rs = np.random.RandomState(seed)
    perm = rs.permutation(n_img)
    vocab = {image_token_name(i): int(bpe_base + s) for i, s in enumerate(perm)}
    return mapping_from_vocab(vocab)


class FakeTokenizer:
    def encode(self, text):
        return [9000 + (ord(c) % 50) for c in text[:8]]


def test_block_grid_roundtrip_with_permutation():
    mapping = shuffled_mapping()
    rs = np.random.RandomState(0)
    grid = rs.randint(0, 64, size=(2, 2)).astype(np.int32)  # 32px, f=16
    block = image_block_from_grid(grid, 32, 32, mapping=mapping)
    # body tokens are BPE ids (permuted), not codebook ids
    body = np.asarray(block[3:-1]).reshape(2, 3)[:, :2]
    assert not np.array_equal(body, grid) or np.all(
        mapping.img2bpe[grid] == grid
    )
    assert all(int(b) in set(mapping.image_bpe_ids.tolist()) for b in body.ravel())
    back = image_grid_from_block(block, mapping=mapping)
    np.testing.assert_array_equal(back, grid)


def test_process_image_pixel_roundtrip():
    """pixels -> process_image -> block -> grid -> codebook ids must equal a
    direct VQ encode of the same pixels."""
    mapping = shuffled_mapping()
    params = init_vq_params(jax.random.PRNGKey(0), TINY_VQ)
    proc = FlexARItemProcessor(FakeTokenizer(), mapping=mapping,
                               vq_params=params, vq_cfg=TINY_VQ)
    rs = np.random.RandomState(1)
    pixels = (rs.rand(32, 32, 3).astype(np.float32) * 2) - 1

    block = proc.process_image(pixels)
    assert block[0] == IMAGE_START_ID and block[-1] == IMAGE_END_ID
    assert block[5] == NEW_LINE_ID  # 3 header + row 0's 2 tokens, then <eol>

    direct = np.asarray(
        vq_encode(params, TINY_VQ, jnp.asarray(pixels[None]))[0], np.int32
    ).reshape(2, 2)
    grid = image_grid_from_block(block, mapping=mapping)
    np.testing.assert_array_equal(grid, direct)

    # and the decoded pixels match a direct codebook decode
    px1 = vq_decode(params, TINY_VQ, jnp.asarray(grid.reshape(1, -1)), (2, 2))
    px2 = vq_decode(params, TINY_VQ, jnp.asarray(direct.reshape(1, -1)), (2, 2))
    np.testing.assert_allclose(np.asarray(px1), np.asarray(px2))


def test_multimodal_prompt_splices_images_in_order():
    mapping = shuffled_mapping()
    params = init_vq_params(jax.random.PRNGKey(0), TINY_VQ)
    proc = FlexARItemProcessor(FakeTokenizer(), mapping=mapping,
                               vq_params=params, vq_cfg=TINY_VQ)
    rs = np.random.RandomState(2)
    img_a = (rs.rand(32, 32, 3).astype(np.float32) * 2) - 1
    img_b = (rs.rand(32, 32, 3).astype(np.float32) * 2) - 1

    ids = proc.multimodal_prompt_ids(
        [["edit <|image|> like <|image|>", None]], images=[img_a, img_b]
    )
    # two image blocks present, in order, each 3 header + 2*(2+1) + 1 = 10 toks
    starts = [i for i, t in enumerate(ids) if t == IMAGE_START_ID]
    assert len(starts) == 2
    block_a = proc.process_image(img_a)
    block_b = proc.process_image(img_b)
    assert ids[starts[0] : starts[0] + len(block_a)] == block_a
    assert ids[starts[1] : starts[1] + len(block_b)] == block_b
    # text tokens surround the blocks
    assert starts[0] > 0 and ids[-1] != IMAGE_END_ID


def test_freeform_multiturn_conversation():
    """qas with an answered first turn (freeform demo shape,
    lumina_mgpt/demos/demo_freeform.py)."""
    mapping = shuffled_mapping()
    params = init_vq_params(jax.random.PRNGKey(0), TINY_VQ)
    proc = FlexARItemProcessor(FakeTokenizer(), mapping=mapping,
                               vq_params=params, vq_cfg=TINY_VQ)
    rs = np.random.RandomState(3)
    img = (rs.rand(32, 32, 3).astype(np.float32) * 2) - 1
    ids = proc.multimodal_prompt_ids(
        [["describe <|image|>", "a red square"], ["now redraw it", None]],
        images=[img],
    )
    assert sum(1 for t in ids if t == IMAGE_START_ID) == 1
    assert len(ids) > 12


def test_anole_encode_image_fn(monkeypatch):
    """get_image_tokens equivalent: pixels -> VQ -> bpe permutation
    (anole/modeling_chameleon.py:1588-1604). Heavy decoder stubbed; the VQ
    path runs for real on a 32px input."""
    import sjd_tpu.loader as L
    import sjd_tpu.models.anole as anole_mod

    class FakeEngine:
        model_cfg = None

    monkeypatch.setattr(anole_mod, "anole_engine", lambda **k: FakeEngine())
    monkeypatch.setattr(L, "_build_decoder_params", lambda *a, **k: {})
    # shrink the VQ so encode runs fast on CPU
    import sjd_tpu.models.vq as vq_mod

    monkeypatch.setattr(vq_mod, "CHAMELEON_VQ", TINY_VQ)
    import sjd_tpu.models.anole  # noqa: F401

    model = L.load_anole()
    rs = np.random.RandomState(5)
    img = (rs.rand(32, 32, 3).astype(np.float32) * 2) - 1
    bpe = model.extras["encode_image_fn"](img)
    assert len(bpe) == 4  # 2x2 latent grid
    mapping = model.extras["mapping"]
    allowed = set(mapping.image_bpe_ids.tolist())
    assert all(t in allowed for t in bpe)
    # roundtrip: bpe -> codebook equals a direct encode
    from sjd_tpu.data.vocab_translation import bpe_to_img
    from sjd_tpu.models.vq import encode as vq_encode

    direct = np.asarray(
        vq_encode(model.extras["vq_params"], TINY_VQ, jnp.asarray(img[None]))[0]
    )
    np.testing.assert_array_equal(bpe_to_img(mapping, np.asarray(bpe)), direct)


def test_process_image_fits_arbitrary_size():
    """A 500x500 PIL input must be fitted to a valid crop size (the
    reference's var_center_crop) instead of crashing the grid reshape or
    desyncing the size header from the actual VQ grid."""
    from PIL import Image

    proc = FlexARItemProcessor(
        FakeTokenizer(), mapping=shuffled_mapping(),
        vq_params=init_vq_params(jax.random.PRNGKey(0), TINY_VQ),
        vq_cfg=TINY_VQ, input_patches=64,
    )
    img = Image.fromarray(
        (np.random.RandomState(0).rand(500, 500, 3) * 255).astype(np.uint8)
    )
    block = proc.process_image(img)
    # header: <image_start> h_tok w_tok; body rows end with <new_line>
    assert block[0] == IMAGE_START_ID
    grid = image_grid_from_block(block, mapping=proc.mapping)
    assert grid.ndim == 2 and grid.size > 0  # header and grid agree
    # fitted to a crop-list size: pixel dims are multiples of the 32px patch
    f = TINY_VQ.downsample_factor
    assert all((s * f) % 32 == 0 for s in grid.shape[0:2])
