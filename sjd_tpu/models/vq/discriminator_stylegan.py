"""StyleGAN2-style discriminator — the reference's second GAN option
(llamagen/tokenizer/tokenizer_image/discriminator_stylegan.py:1-101,
itself from lucidrains/rosinality stylegan2 + maskgit).

Architecture: 3x3 stem conv at the full resolution, residual downsample
blocks halving the grid from image_size to 4x4 (residual path = 1x1
stride-2 conv; main path = two 3x3 convs then blur + 3x3 stride-2;
sum scaled by 1/sqrt(2)), a 3x3 final conv, and a 2-layer MLP head on the
flattened 4x4 map producing one logit per image.

The blur is kornia filter2d with the normalized [1,2,1] outer-product
kernel and reflect padding (kornia's default border_type), implemented
here as a depthwise conv.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

PyTree = Any

_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128,
             256: 64, 512: 32, 1024: 16}


@dataclasses.dataclass(frozen=True)
class StyleGANDiscConfig:
    input_nc: int = 3
    image_size: int = 256
    channel_multiplier: int = 1

    def channels(self, res: int) -> int:
        c = _CHANNELS[res]
        return c * self.channel_multiplier if res >= 64 else c


def _conv_init(rng, kh, kw, cin, cout):
    # torch Conv2d default init: kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
    bound = 1.0 / math.sqrt(cin * kh * kw)
    return jax.random.uniform(rng, (kh, kw, cin, cout), jnp.float32,
                              -bound, bound)


def init_stylegan_disc_params(
    rng: jax.Array, cfg: StyleGANDiscConfig = StyleGANDiscConfig()
) -> PyTree:
    log_size = int(math.log2(cfg.image_size))
    keys = iter(jax.random.split(rng, 8 * log_size + 8))

    def conv(cin, cout, k):
        return {"w": _conv_init(next(keys), k, k, cin, cout),
                "b": jnp.zeros((cout,), jnp.float32)}

    cin = cfg.channels(cfg.image_size)
    params: dict = {"stem": conv(cfg.input_nc, cin, 3), "blocks": []}
    for i in range(log_size, 2, -1):
        cout = cfg.channels(2 ** (i - 1))
        params["blocks"].append({
            "res": conv(cin, cout, 1),
            "net1": conv(cin, cout, 3),
            "net2": conv(cout, cout, 3),
            "down": conv(cout, cout, 3),
        })
        cin = cout
    c4 = cfg.channels(4)
    params["final_conv"] = conv(cin, c4, 3)
    bound1 = 1.0 / math.sqrt(c4 * 16)
    params["fc1"] = {
        "w": jax.random.uniform(next(keys), (c4 * 16, c4), jnp.float32,
                                -bound1, bound1),
        "b": jnp.zeros((c4,), jnp.float32),
    }
    bound2 = 1.0 / math.sqrt(c4)
    params["fc2"] = {
        "w": jax.random.uniform(next(keys), (c4, 1), jnp.float32,
                                -bound2, bound2),
        "b": jnp.zeros((1,), jnp.float32),
    }
    return params


def _conv(x, p, stride=1):
    # torch padding=1 semantics for 3x3 (explicit (1,1) — XLA "SAME" at
    # stride 2 pads (0,1) and shifts the sample grid), none for 1x1
    k = p["w"].shape[0]
    pad = ((1, 1), (1, 1)) if k == 3 else ((0, 0), (0, 0))
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _blur(x: jnp.ndarray) -> jnp.ndarray:
    """Normalized [1,2,1] outer-product depthwise blur, reflect padding
    (kornia filter2d defaults)."""
    f = jnp.asarray([1.0, 2.0, 1.0])
    k = (f[:, None] * f[None, :]) / 16.0
    C = x.shape[-1]
    kd = jnp.tile(k[:, :, None, None], (1, 1, 1, C))  # HWIO, feature_group
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, kd, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )


def stylegan_disc_logits(
    params: PyTree, pixels: jnp.ndarray,
    cfg: StyleGANDiscConfig = StyleGANDiscConfig(),
) -> jnp.ndarray:
    """pixels [B, image_size, image_size, C] in [-1, 1] -> logits [B, 1]."""
    x = _lrelu(_conv(pixels.astype(jnp.float32), params["stem"]))
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    for blk in params["blocks"]:
        res = _conv(x, blk["res"], stride=2)
        h = _lrelu(_conv(x, blk["net1"]))
        h = _lrelu(_conv(h, blk["net2"]))
        h = _conv(_blur(h), blk["down"], stride=2)
        x = (h + res) * inv_sqrt2
    x = _lrelu(_conv(x, params["final_conv"]))
    B = x.shape[0]
    # torch flattens NCHW -> [B, C*4*4]; our NHWC must transpose first
    x = x.transpose(0, 3, 1, 2).reshape(B, -1)
    x = _lrelu(x @ params["fc1"]["w"] + params["fc1"]["b"])
    return x @ params["fc2"]["w"] + params["fc2"]["b"]
