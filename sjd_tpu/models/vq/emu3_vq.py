"""Emu3VisionVQ: spatio-temporal VQ-VAE in JAX (NHWC / NTHWC layouts).

Re-implements emu3/tokenizer/modeling_emu3visionvq.py TPU-first:
  * causal 3-D convolutions (t padded (2, 0), reference :74-107) via
    lax.conv_general_dilated over NDHWC;
  * BatchNorm3d temporal resnet stacks with frozen running stats (:109-177);
  * SpatialNorm-conditioned 2-D decoder (GroupNorm modulated by the
    nearest-resized quantized latent, :180-234);
  * codebook 32768 x 4, spatial factor 8, temporal factor 4; still images are
    repeated over the temporal axis on encode and frame 0 is returned on
    decode (:766-814).

The T2I-critical path is `decode(ids [B, h, w]) -> pixels [B, 8h, 8w, 3]`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .taming import conv2d, group_norm, swish


@dataclasses.dataclass(frozen=True)
class Emu3VQConfig:
    codebook_size: int = 32768
    embed_dim: int = 4
    z_channels: int = 4
    in_channels: int = 3
    out_channels: int = 3
    temporal_downsample_factor: int = 4
    ch: int = 256
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    # level *indices* with attention (reference semantics, :505 / :652)
    attn_levels: Tuple[int, ...] = (3,)
    dtype: Any = jnp.float32

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)

    @property
    def spatial_factor(self) -> int:
        return 2 ** (self.num_resolutions - 1)


EMU3_VQ = Emu3VQConfig()


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def causal_conv3d(x, w, b, *, stride=(1, 1, 1)):
    """x [B, T, H, W, C]; w [kt, kh, kw, ci, co]; t padded (2, 0) and h/w
    padded (ceil, floor) of (k - s) — Emu3VisionVQCausalConv3d (:74-107)."""
    kt, kh, kw = w.shape[:3]
    st, sh, sw = stride
    ph, pw = kh - sh, kw - sw
    pad = [(2, 0), (ph // 2 + ph % 2, ph // 2), (pw // 2 + pw % 2, pw // 2)]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out + b


def batch_norm(x, p, eps: float = 1e-5):
    """Frozen-stats BatchNorm over the channel (last) axis."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    return ((x.astype(jnp.float32) - p["mean"]) * inv * p["scale"] + p["bias"]).astype(
        x.dtype
    )


def spatial_norm(x, zq, p, eps: float = 1e-6):
    """GroupNorm(x) * conv_y(resize(zq)) + conv_b(resize(zq)) (:180-234).
    x [B, H, W, C]; zq [B, h0, w0, C_zq] nearest-resized to (H, W)."""
    B, H, W, _ = x.shape
    h0, w0 = zq.shape[1:3]
    # nearest resize (integer upscale in the decoder)
    ridx = (jnp.arange(H) * h0) // H
    cidx = (jnp.arange(W) * w0) // W
    zq_r = zq[:, ridx][:, :, cidx]
    xn = group_norm(x, p["norm_scale"], p["norm_bias"], eps=eps)
    y = conv2d(zq_r, p["conv_y_w"], p["conv_y_b"])
    bb = conv2d(zq_r, p["conv_b_w"], p["conv_b_b"])
    return xn * y + bb


def _norm(x, zq, p):
    if "conv_y_w" in p:
        return spatial_norm(x, zq, p)
    return group_norm(x, p["norm_scale"], p["norm_bias"])


def res_block_2d(p: Dict, x, zq=None):
    h = conv2d(swish(_norm(x, zq, p["norm1"])), p["conv1_w"], p["conv1_b"])
    h = conv2d(swish(_norm(h, zq, p["norm2"])), p["conv2_w"], p["conv2_b"])
    if "nin_w" in p:
        x = conv2d(x, p["nin_w"], p["nin_b"])
    return x + h


def attn_block_2d(p: Dict, x, zq=None):
    B, H, W, C = x.shape
    nx = _norm(x, zq, p["norm"])
    q = conv2d(nx, p["q_w"], p["q_b"]).reshape(B, H * W, C)
    k = conv2d(nx, p["k_w"], p["k_b"]).reshape(B, H * W, C)
    v = conv2d(nx, p["v_w"], p["v_b"]).reshape(B, H * W, C)
    score = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    score = jax.nn.softmax(score / math.sqrt(C), axis=-1)
    out = jnp.einsum("bqk,bkc->bqc", score.astype(v.dtype), v).reshape(B, H, W, C)
    return x + conv2d(out, p["proj_w"], p["proj_b"])


def temporal_res_block(p: Dict, x):
    """x [B, T, H, W, C]; BN -> swish -> causal conv x2 + shortcut (:109-177)."""
    h = causal_conv3d(swish(batch_norm(x, p["norm1"])), p["conv1_w"], p["conv1_b"])
    h = causal_conv3d(swish(batch_norm(h, p["norm2"])), p["conv2_w"], p["conv2_b"])
    if "nin_w" in p:
        x = jax.lax.conv_general_dilated(
            x, p["nin_w"], (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + p["nin_b"]
    return x + h


def temporal_upsample(p: Dict, x):
    """nearest x2 on T then causal (3,3,3) conv (:393-418)."""
    x = jnp.repeat(x, 2, axis=1)
    return causal_conv3d(x, p["conv_w"], p["conv_b"])


def temporal_downsample(p: Dict, x):
    return causal_conv3d(x, p["conv_w"], p["conv_b"], stride=(2, 1, 1))


# 2-D up/downsampling is identical to the taming VQGAN's (same asymmetric
# (0,1,0,1) pad trick) — shared to keep the convention in one place
from .taming import downsample as _downsample2d  # noqa: E402
from .taming import upsample as _upsample2d  # noqa: E402


# ---------------------------------------------------------------------------
# decode / encode
# ---------------------------------------------------------------------------


def decode(params: Dict, cfg: Emu3VQConfig, ids: jnp.ndarray) -> jnp.ndarray:
    """Token ids [B, h, w] -> pixels [B, h*8, w*8, 3] (frame 0 of the decoded
    clip), matching Emu3VisionVQModel.decode (:790-814)."""
    B, h, w = ids.shape
    quant = params["codebook"][ids][:, None]  # [B, T=1, h, w, C]
    quant2 = causal_conv3d(quant, params["post_quant_conv_w"], params["post_quant_conv_b"])

    d = params["decoder"]
    # temporal stack runs on z and zq stacked along batch (:684-693)
    z_zq = jnp.concatenate([quant2, quant], axis=0)
    for p in d["time_res_stack"]:
        z_zq = temporal_res_block(p, z_zq)
    for p in d["time_conv"]:
        z_zq = swish(temporal_upsample(p, z_zq))
    hzq, zq = jnp.split(z_zq, 2, axis=0)

    T = hzq.shape[1]
    frames = hzq.reshape(B * T, h, w, -1)
    zq_f = zq.reshape(B * T, h, w, -1)

    x = conv2d(frames, d["conv_in_w"], d["conv_in_b"])
    x = res_block_2d(d["mid_block1"], x, zq_f)
    x = attn_block_2d(d["mid_attn"], x, zq_f)
    x = res_block_2d(d["mid_block2"], x, zq_f)
    # levels stored lowest-resolution first
    for level in d["up"]:
        for j in range(cfg.num_res_blocks + 1):
            x = res_block_2d(level["res"][j], x, zq_f)
            if level.get("attn"):
                x = attn_block_2d(level["attn"][j], x, zq_f)
        if "upsample" in level:
            x = _upsample2d(level["upsample"], x)
    x = spatial_norm(x, zq_f, d["norm_out"])
    x = conv2d(swish(x), d["conv_out_w"], d["conv_out_b"])
    # frame 0 of the temporal clip
    x = x.reshape(B, T, h * cfg.spatial_factor, w * cfg.spatial_factor, cfg.out_channels)
    return x[:, 0]


def encode(params: Dict, cfg: Emu3VQConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [B, H, W, 3] (normalized) -> ids [B, H/8, W/8]; the still image
    is repeated temporal_downsample_factor times (:766-788)."""
    B, H, W, _ = pixels.shape
    t = cfg.temporal_downsample_factor
    x = jnp.repeat(pixels[:, None], t, axis=1)  # [B, T, H, W, C]
    e = params["encoder"]

    frames = x.reshape(B * t, H, W, cfg.in_channels)
    hh = conv2d(frames, e["conv_in_w"], e["conv_in_b"])
    for i, level in enumerate(e["down"]):
        for j in range(cfg.num_res_blocks):
            hh = res_block_2d(level["res"][j], hh)
            if level.get("attn"):
                hh = attn_block_2d(level["attn"][j], hh)
        if "downsample" in level:
            hh = _downsample2d(level["downsample"], hh)
    hh = res_block_2d(e["mid_block1"], hh)
    hh = attn_block_2d(e["mid_attn"], hh)
    hh = res_block_2d(e["mid_block2"], hh)
    hh = group_norm(hh, e["norm_out_scale"], e["norm_out_bias"])
    hh = conv2d(swish(hh), e["conv_out_w"], e["conv_out_b"])

    hs, ws = hh.shape[1], hh.shape[2]
    hh = hh.reshape(B, t, hs, ws, -1)
    for p in e["time_conv"]:
        hh = swish(temporal_downsample(p, hh))
    for p in e["time_res_stack"]:
        hh = temporal_res_block(p, hh)

    z = causal_conv3d(hh, params["quant_conv_w"], params["quant_conv_b"])
    flat = z.reshape(-1, cfg.embed_dim).astype(jnp.float32)
    cb = params["codebook"].astype(jnp.float32)
    dist = (
        jnp.sum(flat**2, 1, keepdims=True)
        - 2 * flat @ cb.T
        + jnp.sum(cb**2, 1)[None]
    )
    ids = jnp.argmin(dist, axis=1).reshape(B, z.shape[1], hs, ws)
    return ids[:, 0].astype(jnp.int32)  # frame 0, matching decode's squeeze
