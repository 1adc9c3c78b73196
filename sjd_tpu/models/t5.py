"""T5 text encoder for LlamaGen t2i (layer L1/L2 boundary).

Re-implements llamagen/language/t5.py: a from-scratch flan-t5 encoder stack
(relative position bias, gated-gelu FFN, RMSNorm — no transformers model
classes) plus the reference's caption cleaning and the left-padding flip
applied by the caller (test_llamagen.py:135-148). Weights port straight from
the HF checkpoint files on disk (utils/port.load_torch_checkpoint); only the
sentencepiece tokenizer still rides transformers' AutoTokenizer (a pure
CPU-side vocab, not a model class).
"""

from __future__ import annotations

import dataclasses
import html
import json
import math
import os
import re
import unicodedata
import urllib.parse as ul
from typing import Any, Dict, List, Mapping, Tuple

import numpy as np

import jax
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


# ---------------------------------------------------------------------------
# Native T5 encoder stack (flan-t5 family).
#
# Architecture notes (vs the LLaMA-style decoder elsewhere in models/):
#   * RMSNorm without mean-subtraction, computed in fp32 (T5LayerNorm)
#   * NO attention-score scaling — 1/sqrt(d_kv) is folded into the
#     checkpoint's initialization, so q @ k^T is used raw
#   * a single learned relative-position bias table, owned by block 0 and
#     shared by every layer; bidirectional log-spaced buckets
#   * gated-gelu FFN: gelu_tanh(wi_0 x) * (wi_1 x) -> wo, no biases anywhere
# Reference behavior: llamagen/language/t5.py:62-83 (flan-t5-xl encoder,
# last_hidden_state * attention_mask).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class T5EncoderConfig:
    vocab_size: int = 32128
    d_model: int = 2048
    d_kv: int = 64
    num_heads: int = 32
    d_ff: int = 5120
    num_layers: int = 24
    rel_buckets: int = 32
    rel_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any], dtype=jnp.float32):
        return cls(
            vocab_size=cfg["vocab_size"],
            d_model=cfg["d_model"],
            d_kv=cfg["d_kv"],
            num_heads=cfg["num_heads"],
            d_ff=cfg["d_ff"],
            num_layers=cfg["num_layers"],
            rel_buckets=cfg.get("relative_attention_num_buckets", 32),
            rel_max_distance=cfg.get("relative_attention_max_distance", 128),
            layer_norm_eps=cfg.get("layer_norm_epsilon", 1e-6),
            dtype=dtype,
        )


def _t5_rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (w * (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)).astype(x.dtype)


def _gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    # NewGELUActivation: flan-t5's "gated-gelu" uses the tanh approximation
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * jnp.power(x, 3.0))))


def relative_position_bucket(
    rel_pos: jnp.ndarray, num_buckets: int, max_distance: int
) -> jnp.ndarray:
    """Bidirectional log-spaced bucketing of (key_pos - query_pos): half the
    buckets for each sign, exact within num_buckets//4, log-spaced to
    max_distance beyond."""
    nb = num_buckets // 2
    bucket = (rel_pos > 0).astype(jnp.int32) * nb
    n = jnp.abs(rel_pos)
    max_exact = nb // 2
    is_small = n < max_exact
    scale = (nb - max_exact) / math.log(max_distance / max_exact)
    log_val = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact) * scale
    ).astype(jnp.int32)
    log_val = jnp.minimum(log_val, nb - 1)
    return bucket + jnp.where(is_small, n, log_val)


def t5_position_bias(
    rel_bias: jnp.ndarray,  # [rel_buckets, H]
    seq_len: int,
    cfg: T5EncoderConfig,
) -> jnp.ndarray:
    """[1, H, T, T] additive attention bias from the shared table."""
    pos = jnp.arange(seq_len, dtype=jnp.int32)
    rel = pos[None, :] - pos[:, None]  # memory - query
    buckets = relative_position_bucket(rel, cfg.rel_buckets, cfg.rel_max_distance)
    bias = rel_bias[buckets]  # [T, T, H]
    return bias.transpose(2, 0, 1)[None].astype(cfg.dtype)


def t5_encode(
    params: Mapping[str, jnp.ndarray],
    cfg: T5EncoderConfig,
    ids: jnp.ndarray,  # [B, T] int32
    mask: jnp.ndarray,  # [B, T] 1 = real token
) -> jnp.ndarray:
    """Encoder last_hidden_state [B, T, d_model]. Layers run under lax.scan
    over stacked weights — one compiled block body regardless of depth."""
    B, T = ids.shape
    H, Dk = cfg.num_heads, cfg.d_kv
    x = params["embed"][ids].astype(cfg.dtype)

    bias = t5_position_bias(params["rel_bias"], T, cfg)
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    attn_mask = jnp.where(mask[:, None, None, :].astype(bool), 0.0, neg)
    bias = bias.astype(jnp.float32) + attn_mask  # [B, H, T, T]

    layer_params = {
        k: params[k]
        for k in ("attn_norm", "wq", "wk", "wv", "wo",
                  "ffn_norm", "wi0", "wi1", "wo_ff")
    }

    def block(x, lp):
        h = _t5_rms_norm(x, lp["attn_norm"], cfg.layer_norm_eps)
        q = (h @ lp["wq"].T).reshape(B, T, H, Dk).transpose(0, 2, 1, 3)
        k = (h @ lp["wk"].T).reshape(B, T, H, Dk).transpose(0, 2, 1, 3)
        v = (h @ lp["wv"].T).reshape(B, T, H, Dk).transpose(0, 2, 1, 3)
        # NO 1/sqrt(d) — T5 folds the scale into init
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k,
            preferred_element_type=jnp.float32,
        ) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, H * Dk)
        x = x + ctx @ lp["wo"].T

        h = _t5_rms_norm(x, lp["ffn_norm"], cfg.layer_norm_eps)
        ff = _gelu_tanh(h @ lp["wi0"].T) * (h @ lp["wi1"].T)
        x = x + ff @ lp["wo_ff"].T
        return x, None

    x, _ = jax.lax.scan(block, x, layer_params)
    return _t5_rms_norm(x, params["final_norm"], cfg.layer_norm_eps)


def init_t5_params(rng: jax.Array, cfg: T5EncoderConfig) -> Dict[str, jnp.ndarray]:
    """Random init (tests / drills); layout matches port_t5_encoder."""
    ks = jax.random.split(rng, 12)
    n, d, hd, ff = cfg.num_layers, cfg.d_model, cfg.num_heads * cfg.d_kv, cfg.d_ff

    def norm(k, shape, scale):
        return (jax.random.normal(k, shape) * scale).astype(cfg.dtype)

    return {
        "embed": norm(ks[0], (cfg.vocab_size, d), 1.0),
        "rel_bias": norm(ks[1], (cfg.rel_buckets, cfg.num_heads), 0.5),
        "attn_norm": jnp.ones((n, d), cfg.dtype),
        "wq": norm(ks[2], (n, hd, d), (d * cfg.d_kv) ** -0.5),
        "wk": norm(ks[3], (n, hd, d), d**-0.5),
        "wv": norm(ks[4], (n, hd, d), d**-0.5),
        "wo": norm(ks[5], (n, d, hd), hd**-0.5),
        "ffn_norm": jnp.ones((n, d), cfg.dtype),
        "wi0": norm(ks[6], (n, ff, d), d**-0.5),
        "wi1": norm(ks[7], (n, ff, d), d**-0.5),
        "wo_ff": norm(ks[8], (n, d, ff), ff**-0.5),
        "final_norm": jnp.ones((d,), cfg.dtype),
    }


def port_t5_encoder(
    sd: Mapping[str, np.ndarray], cfg: T5EncoderConfig
) -> Dict[str, jnp.ndarray]:
    """HF T5EncoderModel state dict -> stacked pytree. Accepts both bare
    ("encoder.block...") and prefixed ("encoder.encoder.block...") naming."""
    def get(k):
        for pre in ("", "encoder."):
            if pre + k in sd:
                return np.asarray(sd[pre + k])
        raise KeyError(k)

    n = cfg.num_layers
    dt = cfg.dtype

    def stack(fmt):
        return jnp.asarray(
            np.stack([get(fmt.format(i=i)) for i in range(n)]), dt
        )

    return {
        "embed": jnp.asarray(get("shared.weight"), dt),
        "rel_bias": jnp.asarray(
            get("encoder.block.0.layer.0.SelfAttention"
                ".relative_attention_bias.weight"), dt),
        "attn_norm": stack("encoder.block.{i}.layer.0.layer_norm.weight"),
        "wq": stack("encoder.block.{i}.layer.0.SelfAttention.q.weight"),
        "wk": stack("encoder.block.{i}.layer.0.SelfAttention.k.weight"),
        "wv": stack("encoder.block.{i}.layer.0.SelfAttention.v.weight"),
        "wo": stack("encoder.block.{i}.layer.0.SelfAttention.o.weight"),
        "ffn_norm": stack("encoder.block.{i}.layer.1.layer_norm.weight"),
        "wi0": stack("encoder.block.{i}.layer.1.DenseReluDense.wi_0.weight"),
        "wi1": stack("encoder.block.{i}.layer.1.DenseReluDense.wi_1.weight"),
        "wo_ff": stack("encoder.block.{i}.layer.1.DenseReluDense.wo.weight"),
        "final_norm": jnp.asarray(get("final_layer_norm.weight"), dt),
    }


class T5Embedder:
    """flan-t5-xl (caption_dim 2048) encoder; lazy-loads from a local
    checkpoint directory (no downloads in this environment). The encoder is
    the native stack above — transformers is used only for the sentencepiece
    tokenizer vocab."""

    def __init__(self, model_dir: str, max_length: int = 120,
                 dtype=jnp.float32):
        from transformers import AutoTokenizer

        from sjd_tpu.utils.port import load_torch_checkpoint

        self.tokenizer = AutoTokenizer.from_pretrained(model_dir)
        with open(os.path.join(model_dir, "config.json")) as f:
            self.config = T5EncoderConfig.from_hf_config(json.load(f), dtype)
        import glob as _glob

        files = sorted(
            _glob.glob(os.path.join(model_dir, "*.safetensors"))
            or _glob.glob(os.path.join(model_dir, "pytorch_model*.bin"))
        )
        if not files:
            raise FileNotFoundError(f"no checkpoint files under {model_dir}")
        sd: Dict[str, np.ndarray] = {}
        for f in files:
            sd.update(load_torch_checkpoint(f))
        self.params = port_t5_encoder(sd, self.config)
        self.max_length = max_length
        self._encode = jax.jit(
            lambda p, ids, mask: t5_encode(p, self.config, ids, mask)
        )

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
        out = self._encode(
            self.params,
            jnp.asarray(enc["input_ids"], jnp.int32),
            jnp.asarray(enc["attention_mask"]),
        )
        embs = np.asarray(out) * enc["attention_mask"][:, :, None]
        return flip_padding_to_left(embs, enc["attention_mask"])
