"""Sharded fine-tuning: the TPU-native replacement for the xllmx FSDP solver.

Reference capabilities reproduced (xllmx/solvers/finetune/finetune.py):
  * FSDP FULL_SHARD with bf16 mixed precision (:375-417)   -> 'data'-axis
    parameter sharding via NamedSharding; XLA inserts the all-gathers and
    reduce-scatters the FSDP wrapper did by hand.
  * activation checkpointing on decoder layers (:348-358)  -> jax.checkpoint
    on the scanned layer body (models/transformer.py:forward_train).
  * AdamW + cosine LR with warmup (xllmx/util/lr_sched.py:4-40) -> optax.
  * gradient accumulation + clip_grad_norm (:549-656)      -> optax chain +
    optax.MultiSteps.
  * CE loss with z-loss logsumexp^2 weighting and image-logit masking
    (lumina_mgpt/model/modeling_xllmx_chameleon.py:34-55).
  * metric all-reduce (:627, dist.py:88-99) -> jnp.mean under pjit is already
    a global mean; no explicit collective needed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import transformer
from ..models.transformer import DecoderConfig
from . import sharding as sharding_lib

PyTree = Any


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-5
    min_lr_ratio: float = 0.0
    warmup_steps: int = 100
    total_steps: int = 10_000
    weight_decay: float = 0.1
    grad_clip: float = 1.0
    z_loss_weight: float = 1e-5  # finetune exps use 1e-5 (exps/7B.sh)
    grad_accum: int = 1
    # Disallow image-token logits everywhere before the loss, exactly like
    # the reference (modeling_chameleon.py:1563-1566 sets image-token
    # columns to dtype-min when config.mask_image_logits) — text-only
    # finetuning where CE/z-loss must never credit image tokens. OPT-IN
    # (the reference exposes it as a solver flag): the vocab span below is
    # Chameleon's, and masking it on a model whose labels include those ids
    # makes the loss infinite.
    mask_image_logits: bool = False
    image_vocab_start: int = 4
    image_vocab_end: int = 8195


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    # clamp warmup below total (smoke runs with steps < warmup otherwise
    # crash optax with negative decay_steps)
    warmup = min(cfg.warmup_steps, max(cfg.total_steps // 2, 1))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=warmup,
        decay_steps=cfg.total_steps,
        end_value=cfg.learning_rate * cfg.min_lr_ratio,
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            make_lr_schedule(cfg),
            b1=0.9,
            b2=0.95,
            weight_decay=cfg.weight_decay,
            # no decay on norms/biases (xllmx/util/misc.py param groups)
            mask=lambda p: jax.tree_util.tree_map(lambda x: x.ndim >= 2, p),
        ),
    )
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accum)
    return tx


def loss_fn(
    params: PyTree,
    model_cfg: DecoderConfig,
    train_cfg: TrainConfig,
    ids: jnp.ndarray,  # [B, T]
    labels: jnp.ndarray,  # [B, T]; -100 = ignored (xllmx convention)
    attn_mask: Optional[jnp.ndarray],
    rope_table: jnp.ndarray,
) -> Tuple[jnp.ndarray, dict]:
    B, T = ids.shape
    positions = jnp.arange(T, dtype=jnp.int32)[None, :].repeat(B, 0)
    logits = transformer.forward_train(
        params, model_cfg, ids, positions, attn_mask=attn_mask,
        rope_table=rope_table,
    )  # [B, T, V] fp32, predicts token t+1 at position t
    if train_cfg.mask_image_logits:
        # reference: logits[:, :, image_tokens] = finfo.min
        # (modeling_chameleon.py:1563-1566) BEFORE CE and z-loss
        v = jnp.arange(logits.shape[-1])
        is_img = (v >= train_cfg.image_vocab_start) & (
            v <= train_cfg.image_vocab_end
        )
        logits = jnp.where(
            is_img[None, None, :], jnp.finfo(logits.dtype).min, logits
        )
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    valid = targets != -100
    tgt = jnp.where(valid, targets, 0)

    logz = jax.nn.logsumexp(logits, axis=-1)
    tok_logp = jnp.take_along_axis(logits, tgt[..., None], axis=-1)[..., 0] - logz
    ce = -jnp.sum(tok_logp * valid) / jnp.maximum(jnp.sum(valid), 1)
    # z-loss: mean over labeled positions of logsumexp^2
    # (modeling_xllmx_chameleon.py:48-54)
    z = jnp.sum((logz**2) * valid) / jnp.maximum(jnp.sum(valid), 1)
    loss = ce + train_cfg.z_loss_weight * z
    return loss, {"ce": ce, "z_loss": z, "n_tokens": jnp.sum(valid)}


class TrainState(NamedTuple):
    params: PyTree
    opt_state: Any
    step: jnp.ndarray


def make_train_step(
    mesh: Mesh,
    model_cfg: DecoderConfig,
    train_cfg: TrainConfig,
    *,
    tp: bool = True,
    fsdp: bool = True,
) -> Tuple[Callable, Callable]:
    """Returns (init_fn, step_fn), both jitted with explicit shardings.

    init_fn(rng) -> TrainState with params laid out per the TP/FSDP specs.
    step_fn(state, ids, labels, mask) -> (state, metrics); gradients are
    globally correct because batch inputs are 'data'-sharded and XLA emits
    the reduce-scatter/all-reduce the sharding implies.
    """
    tx = make_optimizer(train_cfg)
    pspecs = sharding_lib.decoder_param_specs(
        model_cfg, tp=tp, fsdp=fsdp, data_size=mesh.shape["data"]
    )
    param_sh = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), pspecs)
    batch_sh = NamedSharding(mesh, P("data"))
    rope = transformer.make_rope_table(model_cfg)

    def init_fn(rng):
        params = transformer.init_params(rng, model_cfg)
        params = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), params, param_sh
        )
        opt_state = tx.init(params)
        return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0))

    def step_fn(state: TrainState, ids, labels, attn_mask):
        # batch rides the 'data' axis regardless of how the host laid it out
        ids, labels, attn_mask = (
            jax.lax.with_sharding_constraint(x, batch_sh)
            for x in (ids, labels, attn_mask)
        )
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, model_cfg, train_cfg, ids, labels, attn_mask, rope
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm, **aux}
        return TrainState(params, opt_state, state.step + 1), metrics

    step_jit = jax.jit(step_fn, donate_argnums=(0,))
    return init_fn, step_jit
