"""VQGAN tokenizer training — the LlamaGen vq_train capability
(llamagen/tokenizer/tokenizer_image/{vq_train.py,vq_loss.py}; note the
reference copy has broken imports and is upstream-only, SURVEY.md §2.5).

TPU-native functional training step for the taming-style VQ of
models/vq/taming.py:
  * straight-through estimator through the quantizer;
  * reconstruction (L1/L2) + codebook & commitment losses (beta 0.25)
    (vq_model.py VectorQuantizer forward);
  * optional adversarial term via a pluggable discriminator fn (the PatchGAN
    of the reference plugs in as `disc_fn`; hinge loss);
  * EMA of generator params (vq_train.py --ema).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .taming import VQConfig, conv2d

PyTree = Any


@dataclasses.dataclass(frozen=True)
class VQTrainConfig:
    learning_rate: float = 1e-4
    beta_commit: float = 0.25
    recon_weight: float = 1.0
    recon_loss: str = "l1"  # | "l2"
    gan_weight: float = 0.0  # >0 enables the adversarial term
    ema_decay: float = 0.999


def _encode_latents(params, cfg: VQConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """Continuous pre-quantization latents z_e [B, h, w, embed_dim]."""
    from .taming import attn_block, group_norm, resnet_block, downsample, swish

    e = params["encoder"]
    h = conv2d(pixels.astype(cfg.dtype), e["conv_in_w"], e["conv_in_b"])
    for level in e["down"]:
        for j in range(cfg.num_res_blocks):
            h = resnet_block(level["res"][j], h)
            if level.get("attn"):
                h = attn_block(level["attn"][j], h)
        if "downsample" in level:
            h = downsample(level["downsample"], h)
    h = resnet_block(e["mid_block1"], h)
    h = attn_block(e["mid_attn"], h)
    h = resnet_block(e["mid_block2"], h)
    h = group_norm(h, e["norm_out_scale"], e["norm_out_bias"])
    h = conv2d(swish(h), e["conv_out_w"], e["conv_out_b"])
    return conv2d(h, params["quant_conv_w"], params["quant_conv_b"])


def _decode_latents(params, cfg: VQConfig, z_q: jnp.ndarray) -> jnp.ndarray:
    from .taming import attn_block, group_norm, resnet_block, swish, upsample

    z = conv2d(z_q.astype(cfg.dtype), params["post_quant_conv_w"],
               params["post_quant_conv_b"])
    d = params["decoder"]
    h = conv2d(z, d["conv_in_w"], d["conv_in_b"])
    h = resnet_block(d["mid_block1"], h)
    h = attn_block(d["mid_attn"], h)
    h = resnet_block(d["mid_block2"], h)
    for level in d["up"]:
        for j in range(cfg.num_res_blocks + 1):
            h = resnet_block(level["res"][j], h)
            if level.get("attn"):
                h = attn_block(level["attn"][j], h)
        if "upsample" in level:
            h = upsample(level["upsample"], h)
    h = group_norm(h, d["norm_out_scale"], d["norm_out_bias"])
    return conv2d(swish(h), d["conv_out_w"], d["conv_out_b"])


def vq_loss_fn(
    params: PyTree,
    cfg: VQConfig,
    tcfg: VQTrainConfig,
    pixels: jnp.ndarray,  # [B, H, W, 3] in [-1, 1]
    disc_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, dict]:
    z_e = _encode_latents(params, cfg, pixels).astype(jnp.float32)
    cb = params["codebook"].astype(jnp.float32)
    if cfg.l2_norm_codebook:
        cbn = cb / jnp.linalg.norm(cb, axis=-1, keepdims=True).clip(1e-12)
        z_en = z_e / jnp.linalg.norm(z_e, axis=-1, keepdims=True).clip(1e-12)
    else:
        cbn, z_en = cb, z_e
    flat = z_en.reshape(-1, cfg.embed_dim)
    d = (
        jnp.sum(flat**2, 1, keepdims=True)
        - 2 * flat @ cbn.T
        + jnp.sum(cbn**2, 1)[None]
    )
    ids = jnp.argmin(d, axis=1)
    z_q = cbn[ids].reshape(z_en.shape)

    codebook_loss = jnp.mean((z_q - jax.lax.stop_gradient(z_en)) ** 2)
    commit_loss = jnp.mean((jax.lax.stop_gradient(z_q) - z_en) ** 2)
    # straight-through estimator (vq_model.py:253)
    z_st = z_en + jax.lax.stop_gradient(z_q - z_en)

    recon = _decode_latents(params, cfg, z_st).astype(jnp.float32)
    if tcfg.recon_loss == "l1":
        rec_loss = jnp.mean(jnp.abs(recon - pixels))
    else:
        rec_loss = jnp.mean((recon - pixels) ** 2)

    loss = (
        tcfg.recon_weight * rec_loss
        + codebook_loss
        + tcfg.beta_commit * commit_loss
    )
    aux = {
        "recon": rec_loss,
        "codebook": codebook_loss,
        "commit": commit_loss,
        # batch codebook-usage fraction (vq_train's codebook_usage tracker)
        "usage": (jnp.bincount(ids, length=cfg.n_embed) > 0).mean(),
    }
    if disc_fn is not None and tcfg.gan_weight > 0:
        # non-saturating generator loss on the reconstruction (vq_loss.py)
        g = -jnp.mean(disc_fn(recon))
        loss = loss + tcfg.gan_weight * g
        aux["gan_g"] = g
    aux["loss"] = loss
    return loss, aux


def hinge_d_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Discriminator hinge loss (vq_loss.py hinge option)."""
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - real_logits))
        + jnp.mean(jax.nn.relu(1.0 + fake_logits))
    )


def make_vq_train_step(cfg: VQConfig, tcfg: VQTrainConfig, disc_fn=None):
    """Generator train step. ``disc_fn`` (frozen discriminator logits fn)
    enables the adversarial term when tcfg.gan_weight > 0 — it was accepted
    by vq_loss_fn but never reachable from here, silently dropping the GAN
    loss. Discriminator updates run in the caller's own step (hinge_d_loss
    below), mirroring the reference's alternating optimizers."""
    tx = optax.adam(tcfg.learning_rate, b1=0.5, b2=0.9)

    @jax.jit
    def step(params, opt_state, ema_params, pixels):
        (loss, aux), grads = jax.value_and_grad(vq_loss_fn, has_aux=True)(
            params, cfg, tcfg, pixels, disc_fn=disc_fn
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = jax.tree_util.tree_map(
            lambda e, p: e * tcfg.ema_decay + p.astype(e.dtype) * (1 - tcfg.ema_decay)
            if e.dtype in (jnp.float32, jnp.bfloat16) else p,
            ema_params, params,
        )
        return params, opt_state, ema_params, aux

    def init(params):
        return tx.init(params), jax.tree_util.tree_map(lambda x: x, params)

    return init, step
