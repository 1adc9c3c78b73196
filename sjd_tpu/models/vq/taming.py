"""Taming-style VQGAN (encoder / vector-quantizer / decoder) in NHWC JAX.

One parametric implementation covers both image tokenizers the reference
vendors:
  * Chameleon VQGAN f16 (lumina_mgpt/model/chameleon_vae_ori/vqgan.py):
    codebook 8192 x 256, ch 128, ch_mult (1,1,2,2,4), attn at the lowest
    resolution, plain codebook lookup.
  * LlamaGen VQ-16/VQ-8 (llamagen/tokenizer/tokenizer_image/vq_model.py):
    codebook 16384 x 8 with L2-normalized embeddings (:218-231), attn at the
    lowest level + mid, same conv trunk.

TPU-first choices: NHWC layout (XLA's native conv layout on TPU), fp32
GroupNorm (eps 1e-6), all convs via lax.conv_general_dilated so XLA fuses the
swish/norm chains. The decode path (token ids -> pixels) is the critical one
(SURVEY.md §1 L2); encode is provided for image-conditioned flows.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VQConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    # attention lives at levels whose current resolution (resolution // 2^i)
    # is in attn_resolutions; empty -> lowest level only (both references).
    resolution: int = 512
    attn_resolutions: Tuple[int, ...] = ()
    z_channels: int = 256
    embed_dim: int = 256  # codebook entry dim (chameleon 256, llamagen 8)
    n_embed: int = 8192
    in_channels: int = 3
    out_ch: int = 3
    l2_norm_codebook: bool = False  # llamagen (vq_model.py:218-231)
    dtype: Any = jnp.float32

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)

    @property
    def downsample_factor(self) -> int:
        return 2 ** (self.num_resolutions - 1)

    def has_attn(self, i_level: int) -> bool:
        if not self.attn_resolutions:
            return i_level == self.num_resolutions - 1
        return (self.resolution // (2**i_level)) in self.attn_resolutions


CHAMELEON_VQ = VQConfig(n_embed=8192, embed_dim=256)
LLAMAGEN_VQ16 = VQConfig(n_embed=16384, embed_dim=8, l2_norm_codebook=True)
LLAMAGEN_VQ8 = VQConfig(
    ch_mult=(1, 2, 2, 4), n_embed=16384, embed_dim=8, l2_norm_codebook=True
)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, *, stride: int = 1,
           padding="SAME") -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def group_norm(x: jnp.ndarray, scale, bias, groups: int = 32, eps: float = 1e-6):
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, H, W, groups, C // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, H, W, C)
    return (xf * scale + bias).astype(x.dtype)


def swish(x):
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def resnet_block(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    h = group_norm(x, p["norm1_scale"], p["norm1_bias"])
    h = conv2d(swish(h), p["conv1_w"], p["conv1_b"])
    h = group_norm(h, p["norm2_scale"], p["norm2_bias"])
    h = conv2d(swish(h), p["conv2_w"], p["conv2_b"])
    if "nin_w" in p:
        x = conv2d(x, p["nin_w"], p["nin_b"])
    return x + h


def attn_block(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    h = group_norm(x, p["norm_scale"], p["norm_bias"])
    q = conv2d(h, p["q_w"], p["q_b"]).reshape(B, H * W, C)
    k = conv2d(h, p["k_w"], p["k_b"]).reshape(B, H * W, C)
    v = conv2d(h, p["v_w"], p["v_b"]).reshape(B, H * W, C)
    scores = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores / math.sqrt(C), axis=-1)
    out = jnp.einsum("bqk,bkc->bqc", probs.astype(v.dtype), v).reshape(B, H, W, C)
    out = conv2d(out, p["proj_w"], p["proj_b"])
    return x + out


def downsample(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    # asymmetric (0,1,0,1) pad then stride-2 valid conv (vqgan.py:177-189)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(x, p["conv_w"], p["conv_b"], stride=2, padding="VALID")


def upsample(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(x, p["conv_w"], p["conv_b"])


# ---------------------------------------------------------------------------
# codebook
# ---------------------------------------------------------------------------


def codebook_lookup(cfg: VQConfig, codebook: jnp.ndarray, ids: jnp.ndarray,
                    grid_hw: Tuple[int, int]) -> jnp.ndarray:
    """Token ids [B, h*w] -> latents [B, h, w, embed_dim]
    (get_codebook_entry; l2-normalized for llamagen, vq_model.py:264-268).

    CONTRACT: ids must already be CODEBOOK indices in [0, n_embed) — LM
    image-token ids go through data/vocab_translation.py first. JAX gather
    clamps out-of-range indices, so feeding raw LM ids here produces
    plausible-looking garbage with no error (the exact silent failure the
    bpe<->img permutation exists to prevent; host-side callers validate in
    vocab_translation.bpe_to_img)."""
    cb = codebook
    if cfg.l2_norm_codebook:
        cb = cb / jnp.linalg.norm(cb, axis=-1, keepdims=True).clip(1e-12)
    h, w = grid_hw
    z = cb[ids]
    return z.reshape(ids.shape[0], h, w, cfg.embed_dim)


def codebook_encode(cfg: VQConfig, codebook: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Nearest-codebook-entry ids for latents z [B, h, w, embed_dim]."""
    cb = codebook
    zf = z.astype(jnp.float32)
    if cfg.l2_norm_codebook:
        cb = cb / jnp.linalg.norm(cb, axis=-1, keepdims=True).clip(1e-12)
        zf = zf / jnp.linalg.norm(zf, axis=-1, keepdims=True).clip(1e-12)
    flat = zf.reshape(-1, cfg.embed_dim)
    d = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        - 2 * flat @ cb.astype(jnp.float32).T
        + jnp.sum(cb.astype(jnp.float32) ** 2, axis=1)[None, :]
    )
    ids = jnp.argmin(d, axis=1).astype(jnp.int32)
    return ids.reshape(z.shape[0], -1)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def encode(params: Dict, cfg: VQConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [B, H, W, 3] (normalized) -> token ids [B, (H/f)*(W/f)]."""
    e = params["encoder"]
    h = conv2d(pixels.astype(cfg.dtype), e["conv_in_w"], e["conv_in_b"])
    for i, level in enumerate(e["down"]):
        for j in range(cfg.num_res_blocks):
            h = resnet_block(level["res"][j], h)
            if "attn" in level and level["attn"]:
                h = attn_block(level["attn"][j], h)
        if "downsample" in level:
            h = downsample(level["downsample"], h)
    h = resnet_block(e["mid_block1"], h)
    h = attn_block(e["mid_attn"], h)
    h = resnet_block(e["mid_block2"], h)
    h = group_norm(h, e["norm_out_scale"], e["norm_out_bias"])
    h = conv2d(swish(h), e["conv_out_w"], e["conv_out_b"])
    z = conv2d(h, params["quant_conv_w"], params["quant_conv_b"])
    return codebook_encode(cfg, params["codebook"], z)


def decode(params: Dict, cfg: VQConfig, ids: jnp.ndarray,
           grid_hw: Tuple[int, int]) -> jnp.ndarray:
    """Token ids [B, h*w] -> pixels [B, h*f, w*f, 3] in [-1, 1]."""
    z = codebook_lookup(cfg, params["codebook"], ids, grid_hw).astype(cfg.dtype)
    z = conv2d(z, params["post_quant_conv_w"], params["post_quant_conv_b"])
    d = params["decoder"]
    h = conv2d(z, d["conv_in_w"], d["conv_in_b"])
    h = resnet_block(d["mid_block1"], h)
    h = attn_block(d["mid_attn"], h)
    h = resnet_block(d["mid_block2"], h)
    # levels stored lowest-resolution first
    for level in d["up"]:
        for j in range(cfg.num_res_blocks + 1):
            h = resnet_block(level["res"][j], h)
            if "attn" in level and level["attn"]:
                h = attn_block(level["attn"][j], h)
        if "upsample" in level:
            h = upsample(level["upsample"], h)
    h = group_norm(h, d["norm_out_scale"], d["norm_out_bias"])
    h = conv2d(swish(h), d["conv_out_w"], d["conv_out_b"])
    return h


# ---------------------------------------------------------------------------
# init (random weights; porting fills from checkpoints)
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout, dtype):
    scale = 1.0 / math.sqrt(kh * kw * cin)
    return jax.random.uniform(key, (kh, kw, cin, cout), dtype, -scale, scale)


def _res_init(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1_scale": jnp.ones((cin,), dtype),
        "norm1_bias": jnp.zeros((cin,), dtype),
        "conv1_w": _conv_init(k1, 3, 3, cin, cout, dtype),
        "conv1_b": jnp.zeros((cout,), dtype),
        "norm2_scale": jnp.ones((cout,), dtype),
        "norm2_bias": jnp.zeros((cout,), dtype),
        "conv2_w": _conv_init(k2, 3, 3, cout, cout, dtype),
        "conv2_b": jnp.zeros((cout,), dtype),
    }
    if cin != cout:
        p["nin_w"] = _conv_init(k3, 1, 1, cin, cout, dtype)
        p["nin_b"] = jnp.zeros((cout,), dtype)
    return p


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm_scale": jnp.ones((c,), dtype),
        "norm_bias": jnp.zeros((c,), dtype),
        "q_w": _conv_init(ks[0], 1, 1, c, c, dtype),
        "q_b": jnp.zeros((c,), dtype),
        "k_w": _conv_init(ks[1], 1, 1, c, c, dtype),
        "k_b": jnp.zeros((c,), dtype),
        "v_w": _conv_init(ks[2], 1, 1, c, c, dtype),
        "v_b": jnp.zeros((c,), dtype),
        "proj_w": _conv_init(ks[3], 1, 1, c, c, dtype),
        "proj_b": jnp.zeros((c,), dtype),
    }


def init_vq_params(rng: jax.Array, cfg: VQConfig) -> Dict:
    dt = cfg.dtype
    keys = iter(jax.random.split(rng, 256))

    def nk():
        return next(keys)

    # encoder
    down = []
    block_in = cfg.ch
    for i in range(cfg.num_resolutions):
        cin = cfg.ch * ((1,) + tuple(cfg.ch_mult))[i]
        cout = cfg.ch * cfg.ch_mult[i]
        level: Dict[str, Any] = {
            "res": [
                _res_init(nk(), cin if j == 0 else cout, cout, dt)
                for j in range(cfg.num_res_blocks)
            ]
        }
        if cfg.has_attn(i):
            level["attn"] = [_attn_init(nk(), cout, dt) for _ in range(cfg.num_res_blocks)]
        if i != cfg.num_resolutions - 1:
            level["downsample"] = {
                "conv_w": _conv_init(nk(), 3, 3, cout, cout, dt),
                "conv_b": jnp.zeros((cout,), dt),
            }
        down.append(level)
        block_in = cout
    encoder = {
        "conv_in_w": _conv_init(nk(), 3, 3, cfg.in_channels, cfg.ch, dt),
        "conv_in_b": jnp.zeros((cfg.ch,), dt),
        "down": down,
        "mid_block1": _res_init(nk(), block_in, block_in, dt),
        "mid_attn": _attn_init(nk(), block_in, dt),
        "mid_block2": _res_init(nk(), block_in, block_in, dt),
        "norm_out_scale": jnp.ones((block_in,), dt),
        "norm_out_bias": jnp.zeros((block_in,), dt),
        "conv_out_w": _conv_init(nk(), 3, 3, block_in, cfg.z_channels, dt),
        "conv_out_b": jnp.zeros((cfg.z_channels,), dt),
    }

    # decoder (levels lowest-res first)
    up = []
    block_in = cfg.ch * cfg.ch_mult[-1]
    for idx, i in enumerate(reversed(range(cfg.num_resolutions))):
        cout = cfg.ch * cfg.ch_mult[i]
        level = {
            "res": [
                _res_init(nk(), block_in if j == 0 else cout, cout, dt)
                for j in range(cfg.num_res_blocks + 1)
            ]
        }
        if cfg.has_attn(i):
            level["attn"] = [
                _attn_init(nk(), cout, dt) for _ in range(cfg.num_res_blocks + 1)
            ]
        if i != 0:
            level["upsample"] = {
                "conv_w": _conv_init(nk(), 3, 3, cout, cout, dt),
                "conv_b": jnp.zeros((cout,), dt),
            }
        up.append(level)
        block_in = cout
    decoder = {
        "conv_in_w": _conv_init(nk(), 3, 3, cfg.z_channels, cfg.ch * cfg.ch_mult[-1], dt),
        "conv_in_b": jnp.zeros((cfg.ch * cfg.ch_mult[-1],), dt),
        "mid_block1": _res_init(nk(), cfg.ch * cfg.ch_mult[-1], cfg.ch * cfg.ch_mult[-1], dt),
        "mid_attn": _attn_init(nk(), cfg.ch * cfg.ch_mult[-1], dt),
        "mid_block2": _res_init(nk(), cfg.ch * cfg.ch_mult[-1], cfg.ch * cfg.ch_mult[-1], dt),
        "up": up,
        "norm_out_scale": jnp.ones((block_in,), dt),
        "norm_out_bias": jnp.zeros((block_in,), dt),
        "conv_out_w": _conv_init(nk(), 3, 3, block_in, cfg.out_ch, dt),
        "conv_out_b": jnp.zeros((cfg.out_ch,), dt),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "codebook": jax.random.uniform(
            nk(), (cfg.n_embed, cfg.embed_dim), jnp.float32,
            -1.0 / cfg.n_embed, 1.0 / cfg.n_embed,
        ),
        "quant_conv_w": _conv_init(nk(), 1, 1, cfg.z_channels, cfg.embed_dim, dt),
        "quant_conv_b": jnp.zeros((cfg.embed_dim,), dt),
        "post_quant_conv_w": _conv_init(nk(), 1, 1, cfg.embed_dim, cfg.z_channels, dt),
        "post_quant_conv_b": jnp.zeros((cfg.z_channels,), dt),
    }
