"""Sharding/pjit tests on the 8-virtual-device CPU mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sjd_tpu.models import DecoderConfig, forward_train, init_params, make_rope_table
from sjd_tpu.parallel import (
    TrainConfig,
    apply_named_sharding,
    decoder_param_specs,
    make_mesh,
    make_train_step,
)

CFG = DecoderConfig(
    vocab_size=64,
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=4,
    head_dim=8,
    qk_norm=True,
    dtype=jnp.float32,
    max_position_embeddings=64,
)


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    m = make_mesh(model=2)
    assert m.shape == {"data": 4, "model": 2}
    m2 = make_mesh(data=8)
    assert m2.shape == {"data": 8, "model": 1}


def test_tp_sharded_forward_matches_single_device():
    """Tensor-parallel forward over 'model' must be numerically identical to
    the unsharded forward."""
    mesh = make_mesh(data=2, model=4)
    params = init_params(jax.random.PRNGKey(0), CFG)
    specs = decoder_param_specs(CFG, tp=True, fsdp=False)
    sharded = apply_named_sharding(mesh, params, specs)

    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 10), 0, 64)
    pos = jnp.arange(10, dtype=jnp.int32)[None].repeat(4, 0)
    rope = make_rope_table(CFG, 64)

    want = forward_train(params, CFG, ids, pos, rope_table=rope, remat=False)

    with jax.set_mesh(mesh):
        got = jax.jit(
            lambda p, i, q: forward_train(p, CFG, i, q, rope_table=rope, remat=False)
        )(sharded, ids, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_train_step_runs_and_decreases_loss():
    """One FSDP+TP train step on the 8-device mesh; loss decreases over a few
    steps of memorizing a fixed batch."""
    mesh = make_mesh(data=4, model=2)
    tcfg = TrainConfig(learning_rate=1e-2, warmup_steps=1, total_steps=50,
                       grad_clip=1.0, z_loss_weight=1e-5)
    init_fn, step_fn = make_train_step(mesh, CFG, tcfg, tp=True, fsdp=True)

    with jax.set_mesh(mesh):
        state = init_fn(jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 12), 0, 64)
        labels = np.array(ids)
        labels[:, :2] = -100  # mask the "prompt"
        labels = jnp.asarray(labels)
        mask = jnp.ones((8, 12), bool)

        losses = []
        for _ in range(5):
            state, metrics = step_fn(state, ids, labels, mask)
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_fsdp_sharding_actually_shards():
    mesh = make_mesh(data=8, model=1)
    params = init_params(jax.random.PRNGKey(0), CFG)
    specs = decoder_param_specs(CFG, tp=False, fsdp=True, data_size=8)
    sharded = apply_named_sharding(mesh, params, specs)
    wq = sharded["layers"]["wq"]
    # a divisible dim got the 'data' axis (layer dim 2 is not divisible by 8)
    assert "data" in tuple(wq.sharding.spec)


@pytest.mark.parametrize("bits", [8, 4])
def test_tp_sharded_quantized_forward_matches(bits):
    """Quantized pytrees (int8 dicts / packed-int4 dicts) shard under TP via
    expand_specs_for_quantized and bit-match the unsharded quantized
    forward — int4 unpack is an op on the logical array, so sharding the
    packed axis is semantically exact."""
    from sjd_tpu.models.transformer import quantize_weights
    from sjd_tpu.parallel.sharding import expand_specs_for_quantized

    mesh = make_mesh(data=2, model=4)
    params = quantize_weights(
        init_params(jax.random.PRNGKey(0), CFG), bits=bits, config=CFG
    )
    specs = expand_specs_for_quantized(
        params, decoder_param_specs(CFG, tp=True, fsdp=False)
    )
    sharded = apply_named_sharding(mesh, params, specs)

    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 10), 0, 64)
    pos = jnp.arange(10, dtype=jnp.int32)[None].repeat(4, 0)
    rope = make_rope_table(CFG, 64)

    want = forward_train(params, CFG, ids, pos, rope_table=rope, remat=False)
    with jax.set_mesh(mesh):
        got = jax.jit(
            lambda p, i, q: forward_train(p, CFG, i, q, rope_table=rope, remat=False)
        )(sharded, ids, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
