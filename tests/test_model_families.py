"""Model-family configuration + the LlamaGen embedding-prompt decode path."""

import jax
import jax.numpy as jnp
import numpy as np

from sjd_tpu.core import EngineConfig, SJDEngine, SamplingParams
from sjd_tpu.models import DecoderConfig, decoder_model_fns, init_params
from sjd_tpu.models.llamagen import (
    LLAMAGEN_GRAMMAR,
    embed_class,
    embed_uncond_class,
    init_cond_params,
    llamagen_config,
)


def test_family_configs_construct():
    from sjd_tpu.models.chameleon import chameleon_config, jacobi_interval_r
    from sjd_tpu.models.emu3 import emu3_config, VISUAL_START, VISUAL_END

    c7 = chameleon_config("7B")
    assert c7.vocab_size == 65536 and c7.qk_norm and c7.num_layers == 32
    c34 = chameleon_config("34B")
    assert c34.swin_norm and c34.num_kv_heads == 8
    assert jacobi_interval_r(768) == 48 * 48 + 48 - 10  # = 2342

    e = emu3_config()
    assert e.num_kv_heads == 8 and e.rope_theta == 1e6
    assert VISUAL_END - VISUAL_START + 1 == 32768

    g = llamagen_config("GPT-XL", block_size=1024)
    assert g.num_layers == 36 and g.hidden_size == 1280
    assert g.rope_style == "2d" and g.rope_2d_grid_side == 32
    # ffn hidden: find_multiple(2*4*1280/3, 256)
    assert g.intermediate_size % 256 == 0


def test_llamagen_c2i_embedding_prompt_decode():
    """Class-conditional generation: 1-token embedding prefix, uncond row as
    the CFG negative, fixed-length image (latent 4x4 = 16 tokens)."""
    latent = 4
    block = latent * latent
    cfg = DecoderConfig(
        vocab_size=32,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=4,
        head_dim=8,
        rope_style="2d",
        rope_2d_cls_len=1,
        rope_2d_grid_side=latent,
        dtype=jnp.float32,
        max_position_embeddings=64,
    )
    rng = jax.random.PRNGKey(0)
    params = init_params(rng, cfg)
    cond = init_cond_params(rng, cfg, num_classes=10, model_type="c2i")
    model = decoder_model_fns(cfg, max_positions=64)
    eng = SJDEngine(
        model,
        EngineConfig(
            window=5,
            interval_r=block - 5 - 2,
            max_len=1 + block,
            eos_id=-1,
            cfg_mode="neg_prompt",
        ),
        LLAMAGEN_GRAMMAR._replace() if hasattr(LLAMAGEN_GRAMMAR, "_replace") else LLAMAGEN_GRAMMAR,
        SamplingParams(do_cfg=True, guidance_scale=4.0, image_top_k=32, text_top_k=32),
    )
    labels = jnp.asarray([3, 7], jnp.int32)
    pe = embed_class(cond, labels, jnp.float32)
    ne = embed_uncond_class(cond, 2, jnp.float32)
    res = eng.generate(params, jax.random.PRNGKey(1), prompt_embeds=pe,
                       neg_prompt_embeds=ne)
    # exactly latent^2 tokens generated (fixed-length c2i image)
    for b in range(2):
        got = int(res.gen_count[b])
        assert block <= got < block + 5, got
    toks = np.asarray(res.tokens[:, 1:1 + block])
    assert toks.min() >= 0 and toks.max() < 32
    assert int(res.nfe) < 2 * block  # CFG shares one doubled forward


def test_llamagen_different_labels_different_images():
    latent = 4
    block = latent * latent
    cfg = DecoderConfig(
        vocab_size=32, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=8, rope_style="2d",
        rope_2d_cls_len=1, rope_2d_grid_side=latent, dtype=jnp.float32,
        max_position_embeddings=64,
    )
    rng = jax.random.PRNGKey(0)
    params = init_params(rng, cfg)
    cond = init_cond_params(rng, cfg, num_classes=10, model_type="c2i")
    model = decoder_model_fns(cfg, max_positions=64)
    eng = SJDEngine(
        model,
        EngineConfig(window=4, interval_r=block, max_len=1 + block, eos_id=-1,
                     cfg_mode="neg_prompt"),
        LLAMAGEN_GRAMMAR,
        SamplingParams(do_cfg=True, guidance_scale=4.0, image_top_k=32,
                       text_top_k=32, greedy=True),
    )
    out = []
    for lbl in (1, 2):
        pe = embed_class(cond, jnp.asarray([lbl], jnp.int32), jnp.float32)
        ne = embed_uncond_class(cond, 1, jnp.float32)
        res = eng.generate(params, jax.random.PRNGKey(1), prompt_embeds=pe,
                           neg_prompt_embeds=ne)
        out.append(np.asarray(res.tokens[0, 1:1 + block]))
    assert not np.array_equal(out[0], out[1])
