"""PatchGAN discriminator for VQGAN adversarial training.

JAX port of the reference's NLayerDiscriminator
(llamagen/tokenizer/tokenizer_image/discriminator_patchgan.py:1-70, the
Pix2Pix/taming PatchGAN): 4x4 convs, stride 2 for the first n_layers, batch
norm + LeakyReLU(0.2), a stride-1 widening block, and a 1-channel logit map
head. Weight init matches `_init_weights` (conv N(0, 0.02), BN gamma
N(1, 0.02), beta 0).

NHWC layout throughout (the taming helpers' convention). BatchNorm uses
batch statistics (torch train mode) — the discriminator only ever runs
inside the training step, so no running-stat state is threaded.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List

import jax
import jax.numpy as jnp

PyTree = Any


@dataclasses.dataclass(frozen=True)
class PatchGANConfig:
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3


def _conv_init(rng, kh, kw, cin, cout):
    return jax.random.normal(rng, (kh, kw, cin, cout), jnp.float32) * 0.02


def init_patchgan_params(rng: jax.Array, cfg: PatchGANConfig = PatchGANConfig()) -> PyTree:
    keys = iter(jax.random.split(rng, 4 + 2 * cfg.n_layers))
    params: dict = {
        "conv0_w": _conv_init(next(keys), 4, 4, cfg.input_nc, cfg.ndf),
        "conv0_b": jnp.zeros((cfg.ndf,), jnp.float32),
    }
    blocks: List[dict] = []
    nf_mult = 1
    for n in range(1, cfg.n_layers + 1):  # stride-2 blocks then one stride-1
        nf_prev, nf_mult = nf_mult, min(2**n, 8)
        blocks.append({
            # bias-free: BatchNorm's beta makes a conv bias redundant
            # (use_bias=False in the reference when norm is BatchNorm2d)
            "w": _conv_init(next(keys), 4, 4, cfg.ndf * nf_prev, cfg.ndf * nf_mult),
            "gamma": 1.0 + jax.random.normal(
                next(keys), (cfg.ndf * nf_mult,), jnp.float32) * 0.02,
            "beta": jnp.zeros((cfg.ndf * nf_mult,), jnp.float32),
        })
    params["blocks"] = blocks
    params["final_w"] = _conv_init(next(keys), 4, 4, cfg.ndf * nf_mult, 1)
    params["final_b"] = jnp.zeros((1,), jnp.float32)
    return params


def _conv4(x: jnp.ndarray, w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """4x4 conv, torch padding=1 semantics."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _batch_norm(x: jnp.ndarray, gamma, beta, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(0, 1, 2), keepdims=True)
    var = xf.var(axis=(0, 1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, 0.2)


def patchgan_logits(
    params: PyTree, pixels: jnp.ndarray, cfg: PatchGANConfig = PatchGANConfig()
) -> jnp.ndarray:
    """pixels [B, H, W, C] in [-1, 1] -> patch logit map [B, h, w, 1].

    Mirrors the reference sequence (discriminator_patchgan.py:31-55): first
    conv has a bias and no norm; n_layers-1 stride-2 BN blocks; one stride-1
    BN block; 1-channel head.
    """
    x = pixels.astype(jnp.float32)
    x = _lrelu(_conv4(x, params["conv0_w"], 2) + params["conv0_b"])
    n_blocks = len(params["blocks"])
    for i, blk in enumerate(params["blocks"]):
        stride = 2 if i < n_blocks - 1 else 1
        x = _lrelu(_batch_norm(_conv4(x, blk["w"], stride), blk["gamma"], blk["beta"]))
    out = _conv4(x, params["final_w"], 1) + params["final_b"]
    # a too-deep stack on a small image collapses the patch map to zero
    # spatial extent; its mean is NaN and silently poisons the G loss even
    # through the disc_start gate (0 * NaN). Fail at trace time instead.
    assert out.shape[1] > 0 and out.shape[2] > 0, (
        f"PatchGAN patch map is empty for input {pixels.shape} at "
        f"n_layers={n_blocks}; reduce n_layers or use a larger image"
    )
    return out
