"""Chameleon BPE <-> VQ-codebook vocabulary translation.

The Chameleon/Lumina/Anole LM does NOT emit VQGAN codebook indices: its image
tokens are BPE vocabulary entries whose *names* spell the codebook id. A token
named ``IMGIMG<letters>Z`` maps to the codebook row obtained by decoding each
letter as a digit (A=0 .. J=9): e.g. ``IMGIMGBCDZ`` -> codebook id 123. The
resulting BPE-id -> codebook-id map is a name-derived **permutation**, not an
offset; feeding raw LM ids into the codebook gathers wrong rows.

Reference behavior being matched:
  * lumina_mgpt/model/chameleon_vae_ori/vocab.py:56-106 (VocabInfo image
    tokens = names starting with "IMGIMG"; VocabTranslation.bpe2img/img2bpe)
  * anole/modeling_chameleon.py:1562-1626 (convert_bpe2img_tokens /
    convert_img2bpe_tokens via dense mapping tensors)
  * scheduler/jacobi_iteration_anhole.py:43-95 (IndexVocabularyMapping)

Both directions here use exact dense lookup tables (the reference's
``img2bpe_mapping_tensor`` / ``bpe2img_mapping_tensor``), never the
searchsorted shortcut of ``VocabTranslation.convert_bpe2img`` — that shortcut
silently assumes the name-derived permutation is monotonic in the BPE ids.
"""

from __future__ import annotations

from typing import Dict, Mapping, NamedTuple

import numpy as np

IMG_PREFIX = "IMGIMG"


class VocabMapping(NamedTuple):
    """Dense translation tables between LM (BPE) ids and VQ codebook ids.

    bpe2img: [max_bpe_id + 1] int32 — codebook id per BPE id (0 elsewhere)
    img2bpe: [codebook_size] int32 — BPE id per codebook id
    image_bpe_ids: sorted int32 array of the LM's image-token ids
    """

    bpe2img: np.ndarray
    img2bpe: np.ndarray
    image_bpe_ids: np.ndarray


def codebook_id_from_name(name: str) -> int:
    """``IMGIMG<letters>Z`` -> codebook id (letters decode as A=0..J=9;
    non-letter characters pass through, matching the reference remap,
    chameleon_vae_ori/vocab.py:73-77)."""
    body = name[len(IMG_PREFIX) : -1]
    digits = "".join(
        str(ord(c) - ord("A")) if "A" <= c <= "J" else c for c in body
    )
    return int(digits)


def image_token_name(codebook_id: int) -> str:
    """Inverse of :func:`codebook_id_from_name` (used to synthesize test
    vocabularies and the identity fallback)."""
    return IMG_PREFIX + "".join(chr(ord("A") + int(d)) for d in str(codebook_id)) + "Z"


def mapping_from_vocab(vocab_map: Mapping[str, int]) -> VocabMapping:
    """Build the translation from a tokenizer vocabulary (name -> id dict),
    e.g. ``tokenizer.get_vocab()`` for the Chameleon/Anole text tokenizer."""
    bpe2img_d: Dict[int, int] = {
        tok: codebook_id_from_name(name)
        for name, tok in vocab_map.items()
        if name.startswith(IMG_PREFIX)
    }
    if not bpe2img_d:
        raise ValueError("vocabulary contains no IMGIMG image tokens")
    bpe_ids = np.asarray(sorted(bpe2img_d), np.int32)
    codebook_size = max(bpe2img_d.values()) + 1
    bpe2img = np.zeros(int(bpe_ids.max()) + 1, np.int32)
    img2bpe = np.zeros(codebook_size, np.int32)
    for bpe, img in bpe2img_d.items():
        bpe2img[bpe] = img
        img2bpe[img] = bpe
    return VocabMapping(bpe2img=bpe2img, img2bpe=img2bpe, image_bpe_ids=bpe_ids)


def identity_mapping(codebook_size: int = 8192, bpe_offset: int = 4) -> VocabMapping:
    """Offset-only fallback (codebook id k <-> BPE id k + offset) for
    tokenizer-free demo runs with random weights. This is NOT the real
    Chameleon permutation — real checkpoints must build the mapping from
    their tokenizer via :func:`mapping_from_vocab`."""
    img = np.arange(codebook_size, dtype=np.int32)
    bpe = img + bpe_offset
    bpe2img = np.zeros(codebook_size + bpe_offset, np.int32)
    bpe2img[bpe] = img
    return VocabMapping(bpe2img=bpe2img, img2bpe=bpe, image_bpe_ids=bpe)


def mapping_from_tokenizer(tokenizer) -> VocabMapping:
    """Convenience: any HF-style tokenizer exposing ``get_vocab()``."""
    return mapping_from_vocab(tokenizer.get_vocab())


def bpe_to_img(mapping: VocabMapping, ids):
    """LM image-token ids -> VQ codebook ids (array in, array out; works on
    numpy and jax arrays — dense gather like convert_bpe2img_tokens).

    The host-side (numpy) path validates that every id IS an image token:
    a silent clamp would map stray eos/text ids from an abnormally
    terminated generation onto plausible codebook rows and decode a
    corrupted-but-valid-looking image. Traced (jax) inputs clamp — raising
    is impossible under jit."""
    table = mapping.bpe2img
    if type(ids).__module__.startswith("jax"):
        import jax.numpy as jnp

        table = jnp.asarray(table)
        return jnp.take(table, jnp.clip(ids, 0, table.shape[0] - 1))
    arr = np.asarray(ids)
    bad = ~np.isin(arr, mapping.image_bpe_ids)
    if bad.any():
        raise ValueError(
            f"{int(bad.sum())} ids are not LM image tokens (e.g. "
            f"{np.unique(arr[bad])[:8].tolist()}) — the generation likely "
            "terminated inside an image"
        )
    return np.take(table, arr)


def img_to_bpe(mapping: VocabMapping, ids):
    """VQ codebook ids -> LM image-token ids (convert_img2bpe_tokens)."""
    table = mapping.img2bpe
    if type(ids).__module__.startswith("jax"):
        import jax.numpy as jnp

        table = jnp.asarray(table)
        return jnp.take(table, jnp.clip(ids, 0, table.shape[0] - 1))
    ids = np.asarray(ids)
    # host path validates like bpe_to_img: a silent clamp would splice the
    # token of an unrelated codebook row into the prompt with no error
    if ids.size and (ids.min() < 0 or ids.max() >= table.shape[0]):
        raise ValueError(
            f"codebook ids out of range [0, {table.shape[0]}): "
            f"min={ids.min()}, max={ids.max()}"
        )
    return np.take(table, ids)
