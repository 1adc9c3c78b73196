"""Anole model family (HF Chameleon port with a VQVAE decoder).

Backbone = Chameleon-7B (same arch as chameleon.py; reference
anole/modeling_chameleon.py). The grammar differs from Lumina's FlexAR
layout: a fixed `image_seq_length` = 1024-token image follows <boi>, with
<eoi> forced at the next offset and no per-row <eol> tokens
(scheduler/jacobi_iteration_anhole.py:97-272, the 3-D ports of the HF
Chameleon processors).

multimodal_generation_mode (reference :121-235):
  "text-only"     — suppress all image tokens + boi/eoi
  "image-only"    — suppress text; force boi, 1024 image tokens, eoi, eos
  "interleaved-*" — no suppression; grammar applies inside open images
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.engine import EngineConfig, SJDEngine
from ..core.grammar import GrammarSpec
from ..core.processors import SamplingParams
from .adapter import decoder_model_fns
from .chameleon import chameleon_config

BOI_ID = 8197
EOI_ID = 8196
IMAGE_VOCAB_START = 4
IMAGE_VOCAB_END = 8195
IMAGE_SEQ_LENGTH = 1024  # 32x32 latents (anole/modeling_chameleon.py:1529-1531)
EOS_ID = 2

def normalize_mode(mode: str) -> str:
    """Canonical multimodal_generation_mode (the reference spells the
    interleaved mode "interleaved-text-image")."""
    mode = {"interleaved-text-image": "interleaved"}.get(mode, mode)
    assert mode in ("image-only", "text-only", "interleaved", "unrestricted"), mode
    return mode


def anole_grammar(
    mode: str = "image-only", *, max_len: int = 0,
    image_seq_length: int = IMAGE_SEQ_LENGTH,
) -> GrammarSpec:
    """Grammar spec per multimodal_generation_mode (reference
    jacobi_iteration_anhole.py:170-262)."""
    mode = normalize_mode(mode)
    return GrammarSpec(
        kind="anole",
        image_start_id=BOI_ID,
        image_end_id=EOI_ID,
        image_vocab_start=IMAGE_VOCAB_START,
        image_vocab_end=IMAGE_VOCAB_END,
        image_seq_length=image_seq_length,
        eos_id=EOS_ID,
        mode=mode,
        # SuppressTokensInIndexRange on <boi> from
        # max_length - image_seq_length - 1 (reference :218-224)
        boi_suppress_from=(
            max_len - image_seq_length - 1
            if max_len and mode in ("image-only", "interleaved")
            else -1
        ),
        suppress_eos_at_begin=(mode == "image-only"),
    )


ANOLE_GRAMMAR = anole_grammar("image-only")


def anole_engine(
    *,
    window: int = 16,
    guidance_scale: float = 7.0,
    image_top_k: int = 2000,
    text_top_k: int = 10,
    top_p: float | None = None,
    scheme: str = "speculative_jacobi",
    init: str = "random",
    max_len: int = 0,
    dtype=jnp.bfloat16,
    greedy: bool = False,
    multimodal_generation_mode: str = "image-only",
    act_quant: str = "bf16",
    model_cfg=None,  # override the 7B config (tiny checkpoint drills)
    image_seq_length: int = IMAGE_SEQ_LENGTH,  # tokens per image; 1024 =
    # the reference's 32x32 grid (anole/modeling_chameleon.py:1529-1531)
) -> SJDEngine:
    cfg = model_cfg if model_cfg is not None else chameleon_config("7B", dtype)
    if act_quant != "bf16":
        import dataclasses

        # W4A8/W8A8 serving: int8 activations on the int8 MXU
        # (transformer.linear_multi; fidelity bounds in
        # tests/test_quant_fidelity.py)
        cfg = dataclasses.replace(cfg, act_quant=act_quant)
    if not max_len:
        max_len = image_seq_length + 128
    # max_len budgets GENERATED tokens only; the rope table must cover
    # prompt + generation, so size from the model's real context limit
    model = decoder_model_fns(
        cfg,
        max_positions=max(cfg.max_position_embeddings, max_len + window + 8),
    )
    econfig = EngineConfig(
        window=window,
        interval_l=1,
        interval_r=image_seq_length + 1,
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
        top_p=top_p,
        greedy=greedy,
    )
    engine = SJDEngine(
        model, econfig,
        anole_grammar(multimodal_generation_mode, max_len=max_len,
                      image_seq_length=image_seq_length),
        sampling,
    )
    engine.model_cfg = cfg
    engine.image_seq_length = image_seq_length
    return engine
