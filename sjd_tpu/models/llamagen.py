"""LlamaGen (gpt-fast style) model family.

Shapes from llamagen/llamagen.py:475-503 (GPT-B 111M .. GPT-7B), vocab 16384
(VQ-16 codebook), 2-D grid RoPE (precompute_freqs_cis_2d, :441-455), SwiGLU
ffn with hidden = multiple_of-rounded 8d/3 (:185-197), class conditioning via
a prepended LabelEmbedder row (c2i, :89-117) or a 120-token CaptionEmbedder
prefix from T5 features (t2i, :122-148).

On TPU the conditioning prefix enters the engine as `prompt_embeds`; CFG uses
`cfg_mode="neg_prompt"` with the uncond embedding (num_classes row of the
label table / the learned uncond caption embedding) as the negative prompt —
exactly the doubled cond_combined batch of llamagen_solver.py:95-120.

The reference's double bookkeeping (HF DynamicCache mirrored onto static
KVCache buffers, llamagen/llamagen_solver.py:211-290) does not exist here:
the engine's static cache + per-sample length is the native design.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.engine import EngineConfig, SJDEngine
from ..core.grammar import GrammarSpec
from ..core.processors import SamplingParams
from .adapter import decoder_model_fns
from .transformer import DecoderConfig

VOCAB_SIZE = 16384


def _ffn_hidden(dim: int, multiple_of: int = 256) -> int:
    hidden = int(2 * (4 * dim) / 3)
    return ((hidden + multiple_of - 1) // multiple_of) * multiple_of


def llamagen_config(
    name: str = "GPT-B",
    *,
    block_size: int = 256,
    cls_token_num: int = 1,
    dtype=jnp.bfloat16,
) -> DecoderConfig:
    """GPT size registry (llamagen/llamagen.py:475-503)."""
    sizes = {
        "GPT-B": dict(n_layer=12, n_head=12, dim=768),
        "GPT-L": dict(n_layer=24, n_head=16, dim=1024),
        "GPT-XL": dict(n_layer=36, n_head=20, dim=1280),
        "GPT-XXL": dict(n_layer=48, n_head=24, dim=1536),
        "GPT-XXXL": dict(n_layer=48, n_head=40, dim=2560),
        "GPT-1B": dict(n_layer=22, n_head=32, dim=2048),
        "GPT-3B": dict(n_layer=24, n_head=32, dim=3200),
        "GPT-7B": dict(n_layer=32, n_head=32, dim=4096),
    }
    s = sizes[name]
    grid = int(math.isqrt(block_size))
    assert grid * grid == block_size, "block_size must be a square grid"
    return DecoderConfig(
        vocab_size=VOCAB_SIZE,
        hidden_size=s["dim"],
        intermediate_size=_ffn_hidden(s["dim"]),
        num_layers=s["n_layer"],
        num_heads=s["n_head"],
        num_kv_heads=s["n_head"],
        head_dim=s["dim"] // s["n_head"],
        rope_theta=10000.0,
        rope_style="2d",
        rope_2d_cls_len=cls_token_num,
        rope_2d_grid_side=grid,
        qk_norm=False,
        norm_eps=1e-5,
        dtype=dtype,
        max_position_embeddings=cls_token_num + block_size + 64,
    )


# LlamaGen has no text/eol/eoi grammar: the whole generation is image tokens
# and length is fixed at latent_size^2 (llamagen_solver.py:371-456).
LLAMAGEN_GRAMMAR = GrammarSpec(
    kind="none", image_vocab_start=0, image_vocab_end=VOCAB_SIZE - 1
)


def init_cond_params(rng: jax.Array, cfg: DecoderConfig, *, num_classes: int = 1000,
                     caption_dim: int = 2048, model_type: str = "c2i") -> dict:
    """Conditioning-embedder parameters (LabelEmbedder / CaptionEmbedder,
    llamagen/llamagen.py:89-148). Kept separate from the decoder pytree."""
    d = cfg.hidden_size
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    if model_type == "c2i":
        return {
            "kind": "c2i",
            # +1 row: the CFG unconditional class (num_classes)
            "label_table": jax.random.normal(k1, (num_classes + 1, d), jnp.float32)
            * 0.02,
        }
    return {
        "kind": "t2i",
        "fc1": jax.random.normal(k1, (caption_dim, d), jnp.float32) * 0.02,
        "fc2": jax.random.normal(k2, (d, d), jnp.float32) * 0.02,
        "uncond_embedding": jax.random.normal(k3, (cfg.rope_2d_cls_len, caption_dim),
                                              jnp.float32) / math.sqrt(caption_dim),
    }


def embed_class(cond_params: dict, labels: jnp.ndarray, dtype) -> jnp.ndarray:
    """[B] class ids -> [B, 1, D] conditioning prefix."""
    return cond_params["label_table"][labels][:, None, :].astype(dtype)


def embed_uncond_class(cond_params: dict, batch: int, dtype) -> jnp.ndarray:
    n = cond_params["label_table"].shape[0] - 1
    return jnp.broadcast_to(
        cond_params["label_table"][n][None, None, :],
        (batch, 1, cond_params["label_table"].shape[1]),
    ).astype(dtype)


def embed_caption(cond_params: dict, t5_feats: jnp.ndarray, dtype) -> jnp.ndarray:
    """[B, 120, caption_dim] T5 features -> [B, 120, D] via the gelu MLP
    (CaptionEmbedder.cap_proj, llamagen/llamagen.py:151-165)."""
    h = t5_feats.astype(jnp.float32) @ cond_params["fc1"]
    h = jax.nn.gelu(h, approximate=True)
    return (h @ cond_params["fc2"]).astype(dtype)


def embed_uncond_caption(cond_params: dict, batch: int, dtype) -> jnp.ndarray:
    u = jnp.broadcast_to(
        cond_params["uncond_embedding"][None],
        (batch,) + cond_params["uncond_embedding"].shape,
    )
    return embed_caption(cond_params, u, dtype)


def llamagen_engine(
    *,
    name: str = "GPT-B",
    latent_size: int = 16,  # 256px / VQ-16
    cls_token_num: int = 1,
    window: int = 16,
    guidance_scale: float = 7.5,
    image_top_k: int = 1000,
    scheme: str = "speculative_jacobi",
    init: str = "random",
    temperature: float = 1.0,
    top_p: float | None = None,
    dtype=jnp.bfloat16,
    greedy: bool = False,
    act_quant: str = "bf16",
    model_cfg: DecoderConfig | None = None,  # override the GPT size
    # registry (tiny checkpoint drills); rope_2d_grid_side must match
    # latent_size and rope_2d_cls_len must match cls_token_num
) -> SJDEngine:
    block = latent_size * latent_size
    cfg = (
        model_cfg if model_cfg is not None
        else llamagen_config(name, block_size=block,
                             cls_token_num=cls_token_num, dtype=dtype)
    )
    if act_quant != "bf16":
        import dataclasses

        # W4A8/W8A8 serving: int8 activations on the int8 MXU
        # (transformer.linear_multi; fidelity bounds in
        # tests/test_quant_fidelity.py)
        cfg = dataclasses.replace(cfg, act_quant=act_quant)
    # generated-token budget: ONLY the image block (conditioning tokens are
    # prompt rows; budgeting them too ran ~cls_token_num wasted forwards
    # past the image under the generated-only max_len semantics)
    max_len = block
    # max_len budgets GENERATED tokens only; the rope table must cover
    # prompt + generation, so size from the model's real context limit
    model = decoder_model_fns(
        cfg,
        max_positions=max(cfg.max_position_embeddings, max_len + window + 8),
    )
    econfig = EngineConfig(
        window=window,
        interval_l=1,
        # interval_r = latent^2 - max_new - 2 (model_wrappers/model_loader.py:270)
        interval_r=block - window - 2,
        scheme=scheme,
        init=init,
        max_len=max_len,
        eos_id=-1,  # fixed-length generation; stops at max_len
        pad_id=0,
        cfg_mode="neg_prompt",
    )
    sampling = SamplingParams(
        guidance_scale=guidance_scale,
        do_cfg=guidance_scale != 1.0,
        image_top_k=image_top_k,
        text_top_k=image_top_k,
        temperature=temperature,
        top_p=top_p,
        greedy=greedy,
    )
    engine = SJDEngine(model, econfig, LLAMAGEN_GRAMMAR, sampling)
    engine.model_cfg = cfg
    return engine
