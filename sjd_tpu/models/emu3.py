"""Emu3-Gen model family.

Shapes from emu3/mllm/configuration_emu3.py:130-152: 8B = 32L, 32H with 8 KV
heads (GQA), 4096d/14336ff, vocab 184622, RoPE theta 1e6, max positions 9216.

Token layout (emu3/mllm/processing_emu3.py:168-181 + utils_emu3.py:19-62):
prompt = bos + text + <|image start|> + "{H}*{W}" + <|image token|>, then the
model emits row-major visual tokens with <|extra_200|>(eol) after each row of
w tokens, then eof, <|image end|>, eos, pad... — all forced at exact offsets
from the <|image token|> position. Visual tokens are the contiguous trailing
block of the vocab (codebook 32768 -> ids [184622-32768, 184621]).

720p default: grid 90x90 (spatial factor 8 on a 720x720 area), sequence
about 90*91 + header = 8.2k tokens.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.engine import EngineConfig, SJDEngine
from ..core.grammar import GrammarSpec, init_state
from ..core.processors import SamplingParams
from .adapter import decoder_model_fns
from .transformer import DecoderConfig

VOCAB_SIZE = 184622
CODEBOOK_SIZE = 32768
# special ids (emu3/mllm/configuration_emu3.py:74-96)
PAD_ID = 151643
EOL_ID = 151846  # <|extra_200|>
EOF_ID = 151847  # <|extra_201|>
BOS_ID = 151849
EOS_ID = 151850
IMG_ID = 151851  # <|image token|>
BOI_ID = 151852  # <|image start|>
EOI_ID = 151853  # <|image end|>
VISUAL_START = VOCAB_SIZE - CODEBOOK_SIZE  # 151854
VISUAL_END = VOCAB_SIZE - 1  # 184621

EMU3_GRAMMAR = GrammarSpec(
    kind="emu3",
    image_start_id=BOI_ID,
    img_token_id=IMG_ID,
    image_end_id=EOI_ID,
    newline_id=EOL_ID,
    eof_id=EOF_ID,
    eos_id=EOS_ID,
    pad_id=PAD_ID,
    image_vocab_start=VISUAL_START,
    image_vocab_end=VISUAL_END,
)


def emu3_config(dtype=jnp.bfloat16) -> DecoderConfig:
    return DecoderConfig(
        vocab_size=VOCAB_SIZE,
        hidden_size=4096,
        intermediate_size=14336,
        num_layers=32,
        num_heads=32,
        num_kv_heads=8,
        head_dim=128,
        rope_theta=1_000_000.0,
        qk_norm=False,
        norm_eps=1e-5,
        dtype=dtype,
        max_position_embeddings=9216,
    )


def emu3_grammar_state(batch: int, h: int, w: int, *, armed: bool = False):
    """Emu3 knows the grid from the prompt ('{H}*{W}').

    The positional constraint anchors at the prompt's trailing
    <|image token|> marker (utils_emu3.py:47-50): the engine's prompt scan
    arms in_image at that marker, so img_count counts GENERATED tokens only.
    Default un-armed — pass armed=True ONLY when the ids fed to the engine
    do not contain the marker (the grammar then counts from the first token
    it sees, which is wrong for real prompts: it used to shift every forced
    offset by the prompt length)."""
    return init_state(
        batch,
        h_lat=jnp.full((batch,), h, jnp.int32),
        w_lat=jnp.full((batch,), w, jnp.int32),
        in_image=armed,
    )


def emu3_engine(
    *,
    h: int = 90,
    w: int = 90,
    window: int = 16,
    guidance_scale: float = 3.0,
    image_top_k: int = 2048,
    text_top_k: int = 10,
    scheme: str = "speculative_jacobi",
    init: str = "random",
    max_len: int = 0,
    temperature: float = 1.0,
    top_p: float | None = None,
    dtype=jnp.bfloat16,
    greedy: bool = False,
    act_quant: str = "bf16",
    model_cfg: DecoderConfig | None = None,  # override the 8B config —
    # tiny-config checkpoint drills; vocab layout must keep the Emu3 ids
) -> SJDEngine:
    if not max_len:
        max_len = h * (w + 1) + 128
    cfg = model_cfg if model_cfg is not None else emu3_config(dtype)
    if act_quant != "bf16":
        import dataclasses

        # W4A8/W8A8 serving: int8 activations on the int8 MXU
        # (transformer.linear_multi; fidelity bounds in
        # tests/test_quant_fidelity.py)
        cfg = dataclasses.replace(cfg, act_quant=act_quant)
    # max_len budgets GENERATED tokens only; the rope table must cover
    # prompt + generation, so size from the model's real context limit
    model = decoder_model_fns(
        cfg,
        max_positions=max(cfg.max_position_embeddings, max_len + window + 8),
    )
    econfig = EngineConfig(
        window=window,
        interval_l=1,
        # interval_r = h*(w+1) - 1 (model_wrappers/model_loader.py:159)
        interval_r=h * (w + 1) - 1,
        scheme=scheme,
        init=init,
        max_len=max_len,
        eos_id=EOS_ID,
        pad_id=PAD_ID,
        cfg_mode="neg_prompt",
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
    engine = SJDEngine(model, econfig, EMU3_GRAMMAR, sampling)
    engine.model_cfg = cfg
    # generate() without an explicit gstate gets the grid-armed state for
    # (h, w) — the positional grammar silently no-ops on a default
    # init_state (size_known=False), which used to wander into text tokens
    # with nothing pointing at the missing emu3_grammar_state.
    engine.default_gstate = lambda batch: emu3_grammar_state(batch, h, w)
    return engine
