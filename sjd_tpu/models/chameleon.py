"""Chameleon / Lumina-mGPT model family.

Shapes from the reference config
(lumina_mgpt/model/chameleon/configuration_chameleon.py:193-240): 7B =
32L/32H/4096d/11008ff, vocab 65536, qk layer-norm per head, RoPE theta 1e4.
Token layout of the FlexAR item processor
(lumina_mgpt/data/item_processor.py:109-145):

  <racm3:break>(=8197, image start) <size h>(8804+h/32) <size w>(8804+w/32)
  then row-major image tokens [4..8195] with <reserved08799>(=8803) after each
  row of w_lat tokens, terminated by <eoss>(=8196, image end);
  latent dims = grid tokens * 2 (logit_processor_3dim.py:107-111).

Engine parameters match model_wrappers/model_loader.py:25-60: window 16,
CFG via prompt masking, image_top_k 2000 / text_top_k 10,
jacobi_loop_interval_r = (ts/16)^2 + ts/16 - 10 for target size ts.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.engine import EngineConfig, SJDEngine
from ..core.grammar import GrammarSpec
from ..core.processors import SamplingParams
from .adapter import decoder_model_fns
from .transformer import DecoderConfig

# --- token ids (lumina_mgpt/data/item_processor.py, logit_processor_3dim.py:65)
IMAGE_START_ID = 8197  # <racm3:break>
IMAGE_END_ID = 8196  # <eoss>
NEW_LINE_ID = 8803  # <reserved08799>
IMAGE_VOCAB_START = 4
IMAGE_VOCAB_END = 8195
SIZE_TOKEN_BASE = 8804
EOS_ID = 8710  # <reserved08706> conversation turn end (data/convertsation.py)

LUMINA_GRAMMAR = GrammarSpec(
    kind="lumina",
    image_start_id=IMAGE_START_ID,
    image_end_id=IMAGE_END_ID,
    newline_id=NEW_LINE_ID,
    image_vocab_start=IMAGE_VOCAB_START,
    image_vocab_end=IMAGE_VOCAB_END,
    size_token_base=SIZE_TOKEN_BASE,
    grid_scale=2,
    header_len=3,
)


def chameleon_config(size: str = "7B", dtype=jnp.bfloat16) -> DecoderConfig:
    if size == "7B":
        return DecoderConfig(
            vocab_size=65536,
            hidden_size=4096,
            intermediate_size=11008,
            num_layers=32,
            num_heads=32,
            num_kv_heads=32,
            head_dim=128,
            rope_theta=10000.0,
            qk_norm=True,
            swin_norm=False,
            norm_eps=1e-5,
            dtype=dtype,
            max_position_embeddings=4096 + 2048,
        )
    if size == "34B":
        # Chameleon-30B/34B: 48L, 64H/8KV GQA, 8192d, swin-norm layers
        return DecoderConfig(
            vocab_size=65536,
            hidden_size=8192,
            intermediate_size=22016,
            num_layers=48,
            num_heads=64,
            num_kv_heads=8,
            head_dim=128,
            rope_theta=10000.0,
            qk_norm=True,
            swin_norm=True,
            norm_eps=1e-5,
            dtype=dtype,
            max_position_embeddings=4096 + 2048,
        )
    raise ValueError(f"unknown chameleon size {size!r}")


def jacobi_interval_r(target_size: int) -> int:
    """(ts/16)^2 + ts/16 - 10 (model_wrappers/model_loader.py:44)."""
    g = target_size // 16
    return g * g + g - 10


def lumina_engine(
    *,
    size: str = "7B",
    target_size: int = 768,
    window: int = 16,
    guidance_scale: float = 3.0,
    image_top_k: int = 2000,
    text_top_k: int = 10,
    scheme: str = "speculative_jacobi",
    init: str = "random",
    max_len: int = 0,
    temperature: float = 1.0,
    top_p: float | None = None,
    dtype=jnp.bfloat16,
    greedy: bool = False,
    kv_quant: bool = True,
    act_quant: str = "bf16",
    model_cfg: DecoderConfig | None = None,  # override the size registry —
    # tiny-config checkpoint drills (tests/test_checkpoint_drill.py) and
    # custom variants; vocab layout must keep the FlexAR token ids
) -> SJDEngine:
    cfg = model_cfg if model_cfg is not None else chameleon_config(size, dtype)
    if kv_quant:
        cfg = dataclasses.replace(cfg, kv_quant=True)
    if act_quant != "bf16":
        # W4A8/W8A8 serving: int8 activations on the int8 MXU (transformer
        # .linear_multi; fidelity bounds in tests/test_quant_fidelity.py)
        cfg = dataclasses.replace(cfg, act_quant=act_quant)
    grid = target_size // 16
    # image span = header(3) + h rows * (w+1) + <eoss>; add slack for text
    if not max_len:
        max_len = grid * (grid + 1) + 64
    # max_len budgets GENERATED tokens only (EngineConfig.max_len); absolute
    # positions reach prompt + generation, so the rope table sizes from the
    # model's real context limit
    model = decoder_model_fns(
        cfg,
        max_positions=max(cfg.max_position_embeddings, max_len + window + 8),
    )
    econfig = EngineConfig(
        window=window,
        interval_l=1,
        interval_r=jacobi_interval_r(target_size),
        scheme=scheme,
        init=init,
        max_len=max_len,
        eos_id=EOS_ID,
        pad_id=0,
        cfg_mode="mask_prompt",
    )
    sampling = SamplingParams(
        guidance_scale=guidance_scale,
        do_cfg=True,
        image_top_k=image_top_k,
        text_top_k=text_top_k,
        temperature=temperature,
        top_p=top_p,
        greedy=greedy,
    )
    engine = SJDEngine(model, econfig, LUMINA_GRAMMAR, sampling)
    engine.model_cfg = cfg
    return engine
