"""Native T5 encoder parity vs transformers' *torch* T5EncoderModel at tiny
scale (round-5 verdict item #2) — same oracle pattern as test_port_parity.py
for Chameleon. Pins the relative-position bucketing, the unscaled attention
scores, the gated-gelu FFN, and the weight-port layout in one shot.
Reference behavior ported: llamagen/language/t5.py:62-83."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sjd_tpu.models.t5 import (
    T5EncoderConfig,
    port_t5_encoder,
    relative_position_bucket,
    t5_encode,
)
from sjd_tpu.utils.port import state_dict_to_numpy

torch = pytest.importorskip("torch")


def _tiny_pair(seed=0):
    from transformers import T5Config, T5EncoderModel

    hf_cfg = T5Config(
        vocab_size=96,
        d_model=32,
        d_kv=8,
        num_heads=4,
        d_ff=48,
        num_layers=3,
        num_decoder_layers=0,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
        is_encoder_decoder=False,
        use_cache=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(seed)
    hf = T5EncoderModel(hf_cfg).eval()
    cfg = T5EncoderConfig(
        vocab_size=96, d_model=32, d_kv=8, num_heads=4, d_ff=48, num_layers=3,
        dtype=jnp.float32,
    )
    params = port_t5_encoder(state_dict_to_numpy(hf.state_dict()), cfg)
    return hf, cfg, params


def test_t5_encoder_parity_full_mask():
    hf, cfg, params = _tiny_pair()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, size=(2, 17))
    mask = np.ones((2, 17), np.int64)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(
        t5_encode(params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_t5_encoder_parity_padded():
    """Right padding masked out: parity holds on the VALID positions (HF
    leaves pad outputs unmasked garbage; the caller zeroes them — so does
    T5Embedder.get_text_embeddings)."""
    hf, cfg, params = _tiny_pair(seed=1)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 96, size=(3, 12))
    mask = np.ones((3, 12), np.int64)
    mask[0, 8:] = 0
    mask[2, 5:] = 0
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(
        t5_encode(params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask))
    )
    np.testing.assert_allclose(
        got * mask[:, :, None], want * mask[:, :, None], rtol=2e-4, atol=2e-4
    )


def test_relative_position_bucket_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    rel = np.arange(-300, 301).reshape(1, -1)
    want = T5Attention._relative_position_bucket(
        torch.tensor(rel), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    got = np.asarray(relative_position_bucket(jnp.asarray(rel), 32, 128))
    np.testing.assert_array_equal(got, want)


def test_no_flax_model_classes_imported():
    """The verdict's done-criterion: the LlamaGen t2i path must not touch
    transformers' (deprecated) Flax model classes."""
    import inspect

    import sjd_tpu.models.t5 as t5_mod

    src = inspect.getsource(t5_mod)
    assert "FlaxT5EncoderModel" not in src
