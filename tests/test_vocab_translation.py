"""BPE<->VQ-codebook vocabulary translation parity against the reference
VocabTranslation (lumina_mgpt/model/chameleon_vae_ori/vocab.py:56-106) and the
Anole IndexVocabularyMapping logic (scheduler/jacobi_iteration_anhole.py:43-95),
both imported read-only as oracles on a synthetic, deliberately NON-monotonic
IMGIMG vocabulary — the mapping is a name-derived permutation, not an offset.
"""

import sys

import numpy as np
import pytest

from sjd_tpu.data.vocab_translation import (
    bpe_to_img,
    codebook_id_from_name,
    identity_mapping,
    image_token_name,
    img_to_bpe,
    mapping_from_vocab,
)

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")


def synthetic_vocab(n_img=64, bpe_base=4, seed=0):
    """IMGIMG names for codebook ids 0..n-1 assigned to SHUFFLED bpe ids —
    stresses the permutation (the real Chameleon vocab interleaves too)."""
    rs = np.random.RandomState(seed)
    perm = rs.permutation(n_img)
    vocab = {"<s>": 0, "</s>": 1, "<racm3:break>": 2, "<eoss>": 3}
    for img_id, slot in enumerate(perm):
        vocab[image_token_name(img_id)] = int(bpe_base + slot)
    # distractor text/special tokens after the image block
    vocab["hello"] = bpe_base + n_img
    vocab["<reserved08706>"] = bpe_base + n_img + 1
    return vocab


def test_name_codec_roundtrip():
    for k in [0, 1, 9, 10, 123, 8191]:
        assert codebook_id_from_name(image_token_name(k)) == k


def test_mapping_matches_reference_vocab_translation():
    from lumina_mgpt.model.chameleon_vae_ori.vocab import (
        VocabInfo,
        VocabTranslation,
    )

    vocab = synthetic_vocab()
    ours = mapping_from_vocab(vocab)
    ref = VocabTranslation(VocabInfo(vocab), device="cpu")

    assert dict(zip(ours.image_bpe_ids.tolist(),
                    ours.bpe2img[ours.image_bpe_ids].tolist())) == ref.bpe2img
    assert {int(i): int(b) for i, b in enumerate(ours.img2bpe)} == ref.img2bpe

    # dense img->bpe table equals the reference's mapping tensor
    ref_tensor = ref.img2bpe_mapping_tensor.numpy()
    np.testing.assert_array_equal(ours.img2bpe, ref_tensor[: len(ours.img2bpe)])

    # batch conversion parity (exact dict direction; the reference's
    # searchsorted convert_bpe2img assumes monotonicity, so compare against
    # the dict itself)
    rs = np.random.RandomState(1)
    img_batch = rs.randint(0, 64, size=(2, 17)).astype(np.int32)
    bpe_batch = img_to_bpe(ours, img_batch)
    assert all(
        ref.img2bpe[int(i)] == int(b)
        for i, b in zip(img_batch.ravel(), bpe_batch.ravel())
    )
    back = bpe_to_img(ours, bpe_batch)
    np.testing.assert_array_equal(back, img_batch)


def test_mapping_matches_anole_index_vocabulary_mapping():
    """The Anole copy derives the same tables from vocab_map (reference
    jacobi_iteration_anhole.py:59-95); replicate its construction inline and
    compare dense tensors."""
    vocab = synthetic_vocab(n_img=32, bpe_base=7, seed=3)
    ours = mapping_from_vocab(vocab)

    # reference construction (torch), lifted semantics: names -> digit remap
    img_chr = {chr(ord("A") + i): str(i) for i in range(10)}
    val2name = {v: k for k, v in vocab.items()}
    image_token_ids = sorted(
        v for k, v in vocab.items() if k.startswith("IMGIMG")
    )
    bpe2img = {
        tok: int("".join(img_chr.get(c, c) for c in val2name[tok][6:-1]))
        for tok in image_token_ids
    }
    img2bpe = {v: k for k, v in bpe2img.items()}
    ref_img2bpe = torch.zeros(max(img2bpe) + 1, dtype=torch.int)
    for k, v in img2bpe.items():
        ref_img2bpe[k] = v
    ref_bpe2img = torch.zeros(max(bpe2img) + 1, dtype=torch.int)
    for k, v in bpe2img.items():
        ref_bpe2img[k] = v

    np.testing.assert_array_equal(ours.img2bpe, ref_img2bpe.numpy())
    np.testing.assert_array_equal(ours.bpe2img, ref_bpe2img.numpy())


def test_identity_fallback_shape_and_jax_path():
    import jax.numpy as jnp

    m = identity_mapping(codebook_size=16, bpe_offset=4)
    ids = jnp.asarray([[0, 5, 15]], jnp.int32)
    bpe = img_to_bpe(m, ids)
    np.testing.assert_array_equal(np.asarray(bpe), [[4, 9, 19]])
    np.testing.assert_array_equal(np.asarray(bpe_to_img(m, bpe)), np.asarray(ids))
