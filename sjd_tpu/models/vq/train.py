"""VQGAN tokenizer training — the LlamaGen vq_train capability
(llamagen/tokenizer/tokenizer_image/{vq_train.py,vq_loss.py}; note the
reference copy has broken imports and is upstream-only, SURVEY.md §2.5).

TPU-native functional training step for the taming-style VQ of
models/vq/taming.py:
  * straight-through estimator through the quantizer;
  * reconstruction (L1/L2) + codebook & commitment losses (beta 0.25)
    (vq_model.py VectorQuantizer forward);
  * FULL adversarial training via `make_vqgan_train_steps`: alternating
    generator/discriminator jitted steps with the PatchGAN discriminator
    (models/vq/discriminator.py), LPIPS perceptual loss
    (models/vq/lpips.py), hinge/vanilla/non-saturating D losses,
    hinge/non-saturating G losses, disc_start gating (adopt_weight) and the
    optional grad-norm adaptive generator weight — the vq_loss.py protocol;
  * EMA of generator params (vq_train.py --ema).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .lpips import lpips
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
    # full VQGAN options (reference vq_train.py:286-304 defaults)
    perceptual_weight: float = 1.0  # LPIPS term (vq_loss.py:98-100)
    disc_weight: float = 0.5
    disc_start: int = 20000  # adopt_weight threshold (vq_loss.py:44-47)
    disc_loss: str = "hinge"  # | "vanilla" | "non-saturating"
    gen_adv_loss: str = "hinge"  # | "non-saturating"
    disc_adaptive_weight: bool = False  # grad-norm ratio (vq_loss.py:112-118)
    disc_lr: float = 1e-4


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


def _vq_forward(
    params: PyTree, cfg: VQConfig, pixels: jnp.ndarray
) -> Tuple[jnp.ndarray, dict]:
    """Shared encode->quantize->decode pass: returns (recon fp32, parts)
    with codebook/commit losses and usage — reused by the plain trainer and
    the full VQGAN trainer."""
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
    parts = {
        "codebook": codebook_loss,
        "commit": commit_loss,
        # batch codebook-usage fraction (vq_train's codebook_usage tracker)
        "usage": (jnp.bincount(ids, length=cfg.n_embed) > 0).mean(),
    }
    return recon, parts


def vq_loss_fn(
    params: PyTree,
    cfg: VQConfig,
    tcfg: VQTrainConfig,
    pixels: jnp.ndarray,  # [B, H, W, 3] in [-1, 1]
    disc_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, dict]:
    recon, parts = _vq_forward(params, cfg, pixels)
    codebook_loss = parts["codebook"]
    commit_loss = parts["commit"]
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
        "usage": parts["usage"],
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


def vanilla_d_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    """softplus D loss (vq_loss.py:21-25)."""
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-real_logits))
        + jnp.mean(jax.nn.softplus(fake_logits))
    )


def non_saturating_d_loss(real_logits, fake_logits) -> jnp.ndarray:
    """Reference-exact 'non-saturating' D loss (vq_loss.py:28-32).

    The reference passes BCEWithLogits arguments SWAPPED — the constant
    ones/zeros tensor is the *input* and the logits are the *target* —
    so with bce(x, y) = max(x,0) - x*y + log1p(exp(-|x|)):
      real term = bce(1, logits_real) = 1 - logits_real + log1p(e^-1)
      fake term = bce(0, logits_fake) = log(2)  (constant: NO fake gradient)
    i.e. the loss is linear in the real logits and ignores the fake ones.
    We reproduce that behavior exactly (a user migrating a reference
    training run gets the same gradient dynamics); the textbook
    BCE-with-logits D loss is the 'vanilla' option (softplus form)."""
    log1p_em1 = jnp.log1p(jnp.exp(-1.0))
    real = jnp.mean(1.0 - real_logits + log1p_em1)
    fake = jnp.full((), jnp.log(2.0)) + 0.0 * jnp.mean(fake_logits)
    return 0.5 * (real + fake)


def hinge_gen_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(fake_logits)


def non_saturating_gen_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Reference-exact (vq_loss.py:39-40, same swapped-argument form):
    bce(1, logits_fake) = 1 - logits_fake + log1p(e^-1) — linear in the
    logits, identical gradient to hinge_gen_loss."""
    return jnp.mean(1.0 - fake_logits + jnp.log1p(jnp.exp(-1.0)))


_D_LOSSES = {
    "hinge": hinge_d_loss,
    "vanilla": vanilla_d_loss,
    "non-saturating": non_saturating_d_loss,
}
_G_LOSSES = {"hinge": hinge_gen_loss, "non-saturating": non_saturating_gen_loss}


def make_vqgan_train_steps(
    cfg: VQConfig,
    tcfg: VQTrainConfig,
    lpips_params: Optional[PyTree] = None,
    disc_cfg=None,
    disc_type: str = "patchgan",  # | "stylegan" (vq_train.py --disc-type)
):
    """Full VQGAN training: alternating generator / discriminator steps —
    the reference's VQLoss two-optimizer protocol (vq_loss.py:120-167 wired
    by vq_train.py's optimizer_idx loop), TPU-native as two jitted steps.

      generator step:  rec + perceptual (LPIPS) + codebook/commit +
                       adopt_weight(disc_weight, step >= disc_start) *
                       [adaptive_weight *] gen_adv(D(recon))
      discriminator:   adopt_weight * d_loss(D(real), D(stop_grad(recon)))

    The optional adaptive weight is the grad-norm ratio at the decoder's
    last conv (calculate_adaptive_weight, vq_loss.py:112-118), computed with
    two extra backward passes w.r.t. that leaf only.

    Returns (init_fn, g_step, d_step):
      init_fn(params, rng) -> (g_opt, d_params, d_opt, ema_params)
      g_step(params, g_opt, ema, d_params, pixels, step) -> (params, g_opt, ema, aux)
      d_step(d_params, d_opt, params, pixels, step) -> (d_params, d_opt, aux)
    """
    if disc_type == "stylegan":
        from .discriminator_stylegan import (
            StyleGANDiscConfig,
            init_stylegan_disc_params as init_disc_params,
            stylegan_disc_logits,
        )

        disc_cfg = disc_cfg or StyleGANDiscConfig()
        disc_logits = stylegan_disc_logits
    else:
        from .discriminator import (
            PatchGANConfig,
            init_patchgan_params as init_disc_params,
            patchgan_logits as disc_logits,
        )

        disc_cfg = disc_cfg or PatchGANConfig()
    d_loss_fn = _D_LOSSES[tcfg.disc_loss]
    g_adv_fn = _G_LOSSES[tcfg.gen_adv_loss]
    g_tx = optax.adam(tcfg.learning_rate, b1=0.5, b2=0.9)
    d_tx = optax.adam(tcfg.disc_lr, b1=0.5, b2=0.9)

    def _nll_and_adv(params, d_params, pixels):
        recon, parts = _vq_forward(params, cfg, pixels)
        if tcfg.recon_loss == "l1":
            rec = jnp.mean(jnp.abs(recon - pixels))
        else:
            rec = jnp.mean((recon - pixels) ** 2)
        nll = tcfg.recon_weight * rec
        p_loss = jnp.float32(0.0)
        if lpips_params is not None and tcfg.perceptual_weight > 0:
            p_loss = jnp.mean(lpips(lpips_params, pixels, recon))
            nll = nll + tcfg.perceptual_weight * p_loss
        adv = g_adv_fn(disc_logits(d_params, recon, disc_cfg))
        return nll, adv, rec, p_loss, parts, recon

    def _g_loss(params, d_params, pixels, disc_w):
        nll, adv, rec, p_loss, parts, _ = _nll_and_adv(params, d_params, pixels)
        loss = nll + parts["codebook"] + tcfg.beta_commit * parts["commit"] + disc_w * adv
        aux = {
            "loss": loss, "recon": rec, "perceptual": p_loss,
            "codebook": parts["codebook"], "commit": parts["commit"],
            "usage": parts["usage"], "gan_g": adv, "disc_w": disc_w,
        }
        return loss, aux

    def _adaptive_weight(params, d_params, pixels):
        """||d nll/d w_last|| / (||d adv/d w_last|| + 1e-4), clipped, on the
        decoder's output conv — the taming heuristic that balances the GAN
        push against the reconstruction gradient scale."""

        def with_last(w_last, pick):
            p2 = dict(params)
            dec = dict(p2["decoder"])
            dec["conv_out_w"] = w_last
            p2["decoder"] = dec
            nll, adv, *_ = _nll_and_adv(p2, d_params, pixels)
            return nll if pick == 0 else adv

        w_last = params["decoder"]["conv_out_w"]
        g_nll = jax.grad(with_last)(w_last, 0)
        g_adv = jax.grad(with_last)(w_last, 1)
        w = jnp.linalg.norm(g_nll.ravel()) / (
            jnp.linalg.norm(g_adv.ravel()) + 1e-4
        )
        return jax.lax.stop_gradient(jnp.clip(w, 0.0, 1e4))

    @jax.jit
    def g_step(params, g_opt, ema_params, d_params, pixels, step):
        disc_w = jnp.where(step >= tcfg.disc_start, tcfg.disc_weight, 0.0)
        if tcfg.disc_adaptive_weight:
            disc_w = disc_w * _adaptive_weight(params, d_params, pixels)
        (loss, aux), grads = jax.value_and_grad(_g_loss, has_aux=True)(
            params, d_params, pixels, disc_w
        )
        updates, g_opt = g_tx.update(grads, g_opt, params)
        params = optax.apply_updates(params, updates)
        ema_params = jax.tree_util.tree_map(
            lambda e, p: e * tcfg.ema_decay + p.astype(e.dtype) * (1 - tcfg.ema_decay)
            if e.dtype in (jnp.float32, jnp.bfloat16) else p,
            ema_params, params,
        )
        return params, g_opt, ema_params, aux

    @jax.jit
    def d_step(d_params, d_opt, params, pixels, step):
        recon, _ = _vq_forward(params, cfg, pixels)
        recon = jax.lax.stop_gradient(recon)
        disc_w = jnp.where(step >= tcfg.disc_start, tcfg.disc_weight, 0.0)

        def loss_fn(dp):
            lr_ = disc_logits(dp, pixels, disc_cfg)
            lf_ = disc_logits(dp, recon, disc_cfg)
            return disc_w * d_loss_fn(lr_, lf_), (lr_, lf_)

        (loss, (lr_, lf_)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            d_params
        )
        updates, d_opt = d_tx.update(grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, updates)
        aux = {
            "d_loss": loss,
            "logits_real": jnp.mean(lr_),
            "logits_fake": jnp.mean(lf_),
        }
        return d_params, d_opt, aux

    def init_fn(params, rng):
        d_params = init_disc_params(rng, disc_cfg)
        return (
            g_tx.init(params),
            d_params,
            d_tx.init(d_params),
            jax.tree_util.tree_map(lambda x: x, params),
        )

    return init_fn, g_step, d_step


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
