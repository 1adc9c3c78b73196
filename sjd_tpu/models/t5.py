"""T5 text encoder for LlamaGen t2i (layer L1/L2 boundary).

Re-implements llamagen/language/t5.py: flan-t5-xl encoder embeddings with the
reference's caption cleaning and the left-padding flip applied by the caller
(test_llamagen.py:135-148). The encoder itself runs through transformers'
FlaxT5EncoderModel so the whole text path stays on TPU — no torch.
"""

from __future__ import annotations

import html
import re
import urllib.parse as ul
from typing import List, Tuple

import numpy as np

import jax.numpy as jnp

_BAD_PUNCT = re.compile(
    r"[" + "#®•©™&@·º½¾¿¡§~" + r"\)" + r"\(" + r"\]" + r"\[" + r"\}" + r"\{" + r"\|" + "\\" + r"\/" + r"\*" + r"]{1,}"
)


def clean_caption(caption: str) -> str:
    """The reference's heavy caption normalization (t5.py:100-204), reduced to
    its behaviorally significant parts: html unescape, url stripping,
    punctuation collapses, whitespace normalization."""
    caption = str(caption).lower().strip()
    caption = ul.unquote_plus(caption)
    caption = html.unescape(html.unescape(caption))
    caption = re.sub(r"<person>", "person", caption)
    caption = re.sub(r"\b((?:https?:|www\.)[^ ]+)", "", caption)  # urls
    caption = re.sub(r"<[^>]*>", "", caption)  # html tags
    caption = _BAD_PUNCT.sub(r" ", caption)
    caption = re.sub(r"\s+\.\s+", r" ", caption)
    caption = re.sub(r"(?:\-|\–|\—|\ا)+", " ", caption)
    caption = re.sub(r"\.{2,}", r" ", caption)
    caption = re.sub(r"\s+", " ", caption)
    caption = caption.strip()
    caption = re.sub(r"^[\"\']([\w\W]+)[\"\']$", r"\1", caption)
    caption = re.sub(r"^\.\S+$", "", caption)
    return caption.strip()


def flip_padding_to_left(
    embs: np.ndarray, mask: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Move each row's valid span to the end (left padding), as the LlamaGen
    caller does before feeding the caption embedder (test_llamagen.py:135-148)."""
    B, T = mask.shape
    out_e = np.zeros_like(embs)
    out_m = np.zeros_like(mask)
    for b in range(B):
        n = int(mask[b].sum())
        out_e[b, T - n :] = embs[b, :n]
        out_m[b, T - n :] = 1
    return out_e, out_m


class T5Embedder:
    """flan-t5-xl (caption_dim 2048) encoder; lazy-loads from a local
    checkpoint directory (no downloads in this environment)."""

    def __init__(self, model_dir: str, max_length: int = 120):
        from transformers import AutoTokenizer, FlaxT5EncoderModel

        self.tokenizer = AutoTokenizer.from_pretrained(model_dir)
        self.model = FlaxT5EncoderModel.from_pretrained(model_dir)
        self.max_length = max_length

    def get_text_embeddings(
        self, texts: List[str]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """texts -> (embeddings [B, max_length, D] left-padded, mask)."""
        texts = [clean_caption(clean_caption(t)) for t in texts]
        enc = self.tokenizer(
            texts,
            max_length=self.max_length,
            padding="max_length",
            truncation=True,
            return_tensors="np",
        )
        out = self.model(
            input_ids=jnp.asarray(enc["input_ids"]),
            attention_mask=jnp.asarray(enc["attention_mask"]),
        ).last_hidden_state
        embs = np.asarray(out) * enc["attention_mask"][:, :, None]
        return flip_padding_to_left(embs, enc["attention_mask"])
