"""T5 text encoder for LlamaGen t2i (layer L1/L2 boundary).

Re-implements llamagen/language/t5.py: flan-t5-xl encoder embeddings with the
reference's caption cleaning and the left-padding flip applied by the caller
(test_llamagen.py:135-148). The encoder itself runs through transformers'
FlaxT5EncoderModel so the whole text path stays on TPU — no torch.
"""

from __future__ import annotations

import html
import re
import unicodedata
import urllib.parse as ul
from typing import List, Tuple

import numpy as np

import jax.numpy as jnp

# exact reference construction (llamagen/language/t5.py:17): the class is
# {# ® • © ™ & @ · º ½ ¾ ¿ ¡ § ~ ( ) [ ] { } | \ / *}
_BAD_PUNCT = re.compile(
    r"[" + "#®•©™&@·º½¾¿¡§~" + "\\)" + "\\(" + "\\]" + "\\[" + "\\}" + "\\{"
    + "\\|" + "\\\\" + "\\/" + "\\*" + r"]{1,}"
)

# ---------------------------------------------------------------------------
# ftfy / bs4 seams: the reference's basic_clean runs ftfy.fix_text and its
# html stripping runs BeautifulSoup (t5.py:94-98, 113). Both are optional in
# this environment, so each gets a small pure-python fallback; when the real
# library is importable the exact reference path is used, keeping
# clean_caption bit-identical to the reference there.
# ---------------------------------------------------------------------------

_LIGATURES = {
    "Ĳ": "IJ", "ĳ": "ij", "ﬀ": "ff", "ﬁ": "fi", "ﬂ": "fl", "ﬃ": "ffi",
    "ﬄ": "ffl", "ﬅ": "ft", "ﬆ": "st",
}
_CURLY_QUOTES = {"‘": "'", "’": "'", "‛": "'", "“": '"', "”": '"', "„": '"'}
_LINE_BREAKS = {"\r\n": "\n", "\r": "\n", "\u2028": "\n", "\u2029": "\n",
                "\u0085": "\n"}
_TERMINAL_ESCAPES = re.compile(r"\x1b\[[0-9;]*[mK]")
_HTML_ENTITY = re.compile(r"&#?\w{1,24};")


def fix_text_fallback(text: str) -> str:
    """Vendor-light stand-in for ftfy.fix_text's *deterministic* transforms
    (mojibake re-decoding is out of scope for caption cleaning): auto html
    unescape, terminal-escape removal, latin ligatures, fullwidth->ASCII
    width folding, quote uncurling, line-break and control-char
    normalization, NFC — the documented fix_text default pipeline."""
    if "<" not in text and _HTML_ENTITY.search(text):
        text = html.unescape(text)
    text = _TERMINAL_ESCAPES.sub("", text)
    for k, v in _LIGATURES.items():
        text = text.replace(k, v)
    # character width: fullwidth/halfwidth forms fold via NFKC per char
    text = "".join(
        unicodedata.normalize("NFKC", ch)
        if "\uff01" <= ch <= "\uffee" else ch
        for ch in text
    )
    for k, v in _CURLY_QUOTES.items():
        text = text.replace(k, v)
    for k, v in _LINE_BREAKS.items():
        text = text.replace(k, v)
    text = "".join(
        ch for ch in text
        if ch in "\n\t" or unicodedata.category(ch) != "Cc"
    )
    return unicodedata.normalize("NFC", text)


try:  # pragma: no cover - environment dependent
    from ftfy import fix_text as _fix_text
except ImportError:
    _fix_text = fix_text_fallback


def _strip_html_fallback(text: str) -> str:
    """BeautifulSoup(caption, 'html.parser').text without bs4: stdlib
    HTMLParser collecting text nodes (same convert_charrefs=True entity
    behavior as bs4's html.parser tree builder)."""
    from html.parser import HTMLParser

    class _Extract(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.parts: list = []

        def handle_data(self, d):
            self.parts.append(d)

    p = _Extract()
    p.feed(text)
    return "".join(p.parts)


try:  # pragma: no cover - environment dependent
    from bs4 import BeautifulSoup as _BS

    def _strip_html(text: str) -> str:
        return _BS(text, features="html.parser").text
except ImportError:
    _strip_html = _strip_html_fallback


def basic_clean(text: str) -> str:
    """ftfy fix + double html unescape + strip (reference t5.py:94-98)."""
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def clean_caption(caption: str) -> str:
    """FULL port of the reference's caption normalization, transform-for-
    transform in the reference order (llamagen/language/t5.py:100-204):
    url/unquote + lowercase, url and html stripping, @-handle removal, CJK
    unicode-range scrubs, dash/quote canonicalization, entity remnants, IP
    addresses, article ids, hashtag/serial-number scrubs, filename and
    watermark-phrase removal, punctuation-run collapses, ftfy basic_clean,
    alphanumeric-id scrubs, dimension strings, spacing fixes, and edge
    quote/punctuation trims."""
    caption = str(caption)
    caption = ul.unquote_plus(caption)
    caption = caption.strip().lower()
    caption = re.sub("<person>", "person", caption)
    # urls:
    caption = re.sub(
        r"\b((?:https?:(?:\/{1,3}|[a-zA-Z0-9%])|[a-zA-Z0-9.\-]+[.](?:com|co|ru|net|org|edu|gov|it)[\w/-]*\b\/?(?!@)))",  # noqa: E501
        "", caption)
    caption = re.sub(
        r"\b((?:www:(?:\/{1,3}|[a-zA-Z0-9%])|[a-zA-Z0-9.\-]+[.](?:com|co|ru|net|org|edu|gov|it)[\w/-]*\b\/?(?!@)))",  # noqa: E501
        "", caption)
    # html:
    caption = _strip_html(caption)

    # @<nickname>
    caption = re.sub(r"@[\w\d]+\b", "", caption)

    # CJK Strokes .. CJK Unified Ideographs (the reference's 7 range scrubs)
    caption = re.sub(r"[\u31c0-\u31ef]+", "", caption)
    caption = re.sub(r"[\u31f0-\u31ff]+", "", caption)
    caption = re.sub(r"[\u3200-\u32ff]+", "", caption)
    caption = re.sub(r"[\u3300-\u33ff]+", "", caption)
    caption = re.sub(r"[\u3400-\u4dbf]+", "", caption)
    caption = re.sub(r"[\u4dc0-\u4dff]+", "", caption)
    caption = re.sub(r"[\u4e00-\u9fff]+", "", caption)

    # all types of dash -> "-"
    caption = re.sub(
        r"[\u002D\u058A\u05BE\u1400\u1806\u2010-\u2015\u2E17\u2E1A\u2E3A\u2E3B\u2E40\u301C\u3030\u30A0\uFE31\uFE32\uFE58\uFE63\uFF0D]+",  # noqa: E501
        "-", caption)

    # quotes to one standard
    caption = re.sub(r"[`´«»“”¨]", '"', caption)
    caption = re.sub(r"[‘’]", "'", caption)

    # &quot; / &amp remnants
    caption = re.sub(r"&quot;?", "", caption)
    caption = re.sub(r"&amp", "", caption)

    # ip addresses:
    caption = re.sub(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", " ", caption)

    # article ids:
    caption = re.sub(r"\d:\d\d\s+$", "", caption)

    # \n
    caption = re.sub(r"\\n", " ", caption)

    # "#123" / "#12345.." / "123456.."
    caption = re.sub(r"#\d{1,3}\b", "", caption)
    caption = re.sub(r"#\d{5,}\b", "", caption)
    caption = re.sub(r"\b\d{6,}\b", "", caption)
    # filenames:
    caption = re.sub(
        r"[\S]+\.(?:png|jpg|jpeg|bmp|webp|eps|pdf|apk|mp4)", "", caption)

    caption = re.sub(r"[\"\']{2,}", r'"', caption)  # """AUSVERKAUFT"""
    caption = re.sub(r"[\.]{2,}", r" ", caption)

    caption = _BAD_PUNCT.sub(r" ", caption)  # ***AUSVERKAUFT***, #AUSVERKAUFT
    caption = re.sub(r"\s+\.\s+", r" ", caption)  # " . "

    # this-is-my-cute-cat / this_is_my_cute_cat
    regex2 = re.compile(r"(?:\-|\_)")
    if len(re.findall(regex2, caption)) > 3:
        caption = re.sub(regex2, " ", caption)

    caption = basic_clean(caption)

    caption = re.sub(r"\b[a-zA-Z]{1,3}\d{3,15}\b", "", caption)  # jc6640
    caption = re.sub(r"\b[a-zA-Z]+\d+[a-zA-Z]+\b", "", caption)  # jc6640vc
    caption = re.sub(r"\b\d+[a-zA-Z]+\d+\b", "", caption)  # 6640vc231

    caption = re.sub(r"(worldwide\s+)?(free\s+)?shipping", "", caption)
    caption = re.sub(r"(free\s)?download(\sfree)?", "", caption)
    caption = re.sub(r"\bclick\b\s(?:for|on)\s\w+", "", caption)
    caption = re.sub(
        r"\b(?:png|jpg|jpeg|bmp|webp|eps|pdf|apk|mp4)(\simage[s]?)?", "",
        caption)
    caption = re.sub(r"\bpage\s+\d+\b", "", caption)

    caption = re.sub(
        r"\b\d*[a-zA-Z]+\d+[a-zA-Z]+\d+[a-zA-Z\d]*\b", r" ", caption)  # j2d1a2a

    caption = re.sub(r"\b\d+\.?\d*[xх×]\d+\.?\d*\b", "", caption)

    caption = re.sub(r"\b\s+\:\s+", r": ", caption)
    caption = re.sub(r"(\D[,\./])\b", r"\1 ", caption)
    caption = re.sub(r"\s+", " ", caption)

    # (the reference calls caption.strip() here WITHOUT assignment — a no-op
    # kept out rather than "fixed", to stay byte-identical)

    caption = re.sub(r"^[\"\']([\w\W]+)[\"\']$", r"\1", caption)
    caption = re.sub(r"^[\'\_,\-\:;]", r"", caption)
    caption = re.sub(r"[\'\_,\-\:\-\+]$", r"", caption)
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
