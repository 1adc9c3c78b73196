"""VQ tokenizer training step: losses finite, reconstruction improves."""

import jax
import jax.numpy as jnp
import numpy as np

from sjd_tpu.models.vq import VQConfig, init_vq_params
from sjd_tpu.models.vq.train import VQTrainConfig, hinge_d_loss, make_vq_train_step

CFG = VQConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=16,
    z_channels=32, embed_dim=4, n_embed=32, dtype=jnp.float32,
)


def test_vq_train_step_reduces_recon():
    params = init_vq_params(jax.random.PRNGKey(0), CFG)
    tcfg = VQTrainConfig(learning_rate=3e-4)
    init, step = make_vq_train_step(CFG, tcfg)
    opt_state, ema = init(params)

    rs = np.random.RandomState(0)
    pixels = jnp.asarray(np.tanh(rs.randn(2, 16, 16, 3)).astype(np.float32))

    first = None
    for i in range(8):
        params, opt_state, ema, aux = step(params, opt_state, ema, pixels)
        if first is None:
            first = float(aux["recon"])
    assert np.isfinite(float(aux["loss"]))
    assert float(aux["recon"]) < first
    assert 0.0 < float(aux["usage"]) <= 1.0


def test_hinge_d_loss():
    real = jnp.asarray([2.0, 2.0])
    fake = jnp.asarray([-2.0, -2.0])
    assert float(hinge_d_loss(real, fake)) == 0.0  # perfectly separated
    assert float(hinge_d_loss(-real, -fake)) > 0.0
