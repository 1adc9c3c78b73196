"""Model loading / wrapper registry (layer L5).

The uniform `load_pretrained_model(name, ...) -> LoadedModel` +
`.sample_fn(prompt) -> PIL.Image` interface of the reference's
model_wrappers/model_loader.py:25-574, rebuilt for the TPU engine:

  * "lumina_mgpt" — Chameleon-7B + FlexAR prompting + Chameleon VQGAN decode
  * "anole"       — HF-Chameleon + fixed-1024-token image grammar
  * "emu3"        — Emu3-8B + positional grammar + Emu3VisionVQ decode
  * "llamagen"    — GPT-{B..3B} + VQ-16 decode (+ T5 embedder for t2i)

Checkpoints load through utils/port.py when a directory is given; without
one, weights are random-initialized (shape-correct) so the full pipeline is
drivable in environments with no model downloads — generation then produces
VQ noise images but every stage (prompting, SJD decoding, grammar, VQ
detokenization) runs for real.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

PyTree = Any


@dataclasses.dataclass
class LoadedModel:
    name: str
    engine: Any
    params: PyTree
    sample_fn: Callable[[str], Any]  # prompt -> PIL.Image
    extras: dict

    @property
    def smoke(self) -> bool:
        """True when any fallback (random weights / placeholder prompt ids /
        random VQ) is in play — outputs exercise the pipeline but are NOT
        real generations. Mirrors ``extras["smoke"]``."""
        return bool(self.extras.get("smoke"))


def _mark_smoke(extras: dict, family: str, reasons: list) -> dict:
    """Surface fallback ("smoke") mode on the LoadedModel so harness outputs
    can't be mistaken for real generations: extras["smoke"] flag +
    per-fallback reasons + one warning log line at load time."""
    extras["smoke"] = bool(reasons)
    extras["smoke_reasons"] = list(reasons)
    if reasons:
        import logging

        logging.getLogger("sjd_tpu.loader").warning(
            "%s loaded in SMOKE mode (%s): generations exercise the full "
            "pipeline but are not real model outputs",
            family, "; ".join(reasons),
        )
    return extras


def _to_pil(pixels: np.ndarray):
    from PIL import Image

    arr = np.asarray(pixels, np.float32)
    arr = ((np.clip(arr, -1, 1) + 1) * 127.5).astype(np.uint8)
    return Image.fromarray(arr)


def _image_to_array(image) -> np.ndarray:
    """PIL image -> normalized [-1, 1] float array; arrays pass through
    (they are documented as already normalized, matching the VQ encoders)."""
    if hasattr(image, "convert") and not isinstance(image, np.ndarray):
        return np.asarray(image.convert("RGB"), np.float32) / 127.5 - 1.0
    return np.asarray(image, np.float32)


_INT4_OPTS = (4, "4", "int4", "w4a8", "int4_a8")


def _act_quant_of(quantize) -> str:
    """"w4a8"/"int4_a8" select int8 activations on the int8 MXU (W4A8 —
    the batch-serving mode: ~14% faster S=8 steps, identical S=2; fidelity
    bounds in tests/test_quant_fidelity.py). Everything else serves bf16
    activations."""
    return "int8" if quantize in ("w4a8", "int4_a8") else "bf16"


def _build_decoder_params(model_cfg, ckpt_dir, quantize, embed_bits=None):
    """Port (or random-init) decoder params, optionally with quantized
    weights. ``quantize``: False = bf16; True or 8 = int8 W8A16 (the serving
    default; DecoderConfig.act_quant); 4 or "int4" = packed int4 W4A16 with
    per-channel scales + equilibration and an int8 lm_head (half the weight
    HBM reads — see quantize_weights); "w4a8" = the same int4 weights with
    int8 activations on the int8 MXU (the loaders pair it with the engine's
    act_quant="int8" via _act_quant_of). Quantization is fused with
    init/port so bf16 and quantized copies never coexist in HBM (7B bf16 +
    int8 exceed one v5e chip)."""
    from sjd_tpu.models import init_params

    if ckpt_dir:
        from sjd_tpu.utils.port import port_hf_llama_like

        params = port_hf_llama_like(_load_sharded_state(ckpt_dir), model_cfg)
        if quantize:
            params = quantize_ported_params(params, model_cfg, quantize,
                                            embed_bits=embed_bits)
        return _maybe_persist_int4(params)
    if quantize:
        # random-init path: skip int4 equilibration — it is a no-op on
        # random weights (no outlier columns) and its folds make every bf16
        # weight live at once inside the fused init+quantize jit (HBM OOM
        # for the 8B). Checkpoint loads quantize host-side and keep it on.
        import functools

        from sjd_tpu.models.transformer import quantize_weights

        bits = 4 if quantize in _INT4_OPTS else 8
        quant = functools.partial(
            quantize_weights, bits=bits, head_bits=8, config=model_cfg,
            embed_bits=embed_bits,
        )
        return _maybe_persist_int4(jax.jit(
            lambda k: quant(init_params(k, model_cfg), equilibrate=False)
        )(jax.random.PRNGKey(0)))
    return jax.jit(lambda k: init_params(k, model_cfg))(jax.random.PRNGKey(0))


def _maybe_persist_int4(params: PyTree) -> PyTree:
    """On a real TPU backend, unpack packed-int4 leaves ONCE (donated) so
    the s4 arrays are the only at-rest weight copy — frees the ~3 GB (7B) /
    ~4 GB (8B) duplicate that the in-jit unpack otherwise materializes in
    every generate/resume call (the dominant slot-budget term; PERF_NOTES
    round-4 "s4 at rest"). No-op for non-int4 params and off-TPU (CPU tests
    keep exercising the packed jit-input path, which remains supported)."""
    if jax.default_backend() != "tpu":
        return params
    from sjd_tpu.models.transformer import persist_int4_params

    return persist_int4_params(params)


def quantize_ported_params(params: PyTree, model_cfg, quantize,
                           embed_bits=None) -> PyTree:
    """Quantize a ported (checkpoint) pytree for serving.

    ``quantize``: True/8 = int8 W8A16, 4/"int4" = packed int4 W4A16 with an
    int8 lm_head (the head's logits feed speculative acceptance directly —
    bench NFE 1218 with an int4 head vs 1155 with int8; reference 1115).

    Runs on the host CPU backend when one is available: the int4
    equilibration folds tie every bf16 projection's liveness together, so an
    on-device fused quantize needs ALL bf16 weights resident at once — fine
    for 7B (13 GB), OOM for the 8B Emu3 on one 16 GB chip. Quantizing on CPU
    and transferring only the quantized pytree (3.5-9 GB) sidesteps that for
    every model size. Falls back to an on-device donated jit when no CPU
    backend exists.
    """
    import functools

    from sjd_tpu.models.transformer import quantize_weights

    bits = 4 if quantize in _INT4_OPTS else 8
    quant = functools.partial(
        quantize_weights, bits=bits, head_bits=8, config=model_cfg,
        embed_bits=embed_bits,
    )
    try:
        cpu = jax.local_devices(backend="cpu")
    except RuntimeError:
        cpu = []
    if cpu:
        with jax.default_device(cpu[0]):
            params = jax.jit(quant)(params)
        return jax.device_put(params)
    return jax.jit(quant, donate_argnums=(0,))(params)


def _load_sharded_state(ckpt_dir: str) -> dict:
    from sjd_tpu.utils.port import load_torch_checkpoint

    files = sorted(
        glob.glob(os.path.join(ckpt_dir, "*.safetensors"))
        or glob.glob(os.path.join(ckpt_dir, "pytorch_model*.bin"))
        or glob.glob(os.path.join(ckpt_dir, "*.pt"))
        or glob.glob(os.path.join(ckpt_dir, "*.pth"))
    )
    if not files:
        raise FileNotFoundError(f"no checkpoint files under {ckpt_dir}")
    state: dict = {}
    for f in files:
        state.update(load_torch_checkpoint(f))
    return state


def load_lumina_mgpt(
    ckpt_dir: Optional[str] = None,
    vq_ckpt: Optional[str] = None,
    *,
    size: str = "7B",
    target_size: int = 768,
    window: int = 16,
    guidance_scale: float = 3.0,
    image_top_k: int = 2000,
    scheme: str = "speculative_jacobi",
    init: str = "random",
    seed: int = 42,
    tokenizer=None,
    quantize: bool = False,
    embed_bits: Optional[int] = None,  # 8 = int8 per-row embedding table
    # (halves the at-rest embed HBM; see transformer.embed_lookup)
    vq_dtype=None,  # e.g. jnp.bfloat16: halves VQ-decode activation HBM —
    # the batched-serving setting (demo_server --slots > 1), where the
    # decoder's 768px fp32 transients (~1 GB) OOM next to a full slot batch
    model_cfg=None,  # DecoderConfig override (tiny checkpoint drills /
    # custom variants) — must keep the FlexAR vocab layout
    vq_cfg=None,  # VQConfig override, same purpose
) -> LoadedModel:
    from sjd_tpu.data.item_processor import FlexARItemProcessor, size_token_id
    from sjd_tpu.data.vocab_translation import (
        identity_mapping,
        mapping_from_tokenizer,
    )
    from sjd_tpu.models.chameleon import IMAGE_START_ID, lumina_engine
    from sjd_tpu.models.vq import CHAMELEON_VQ, decode as vq_decode, init_vq_params, port_vqgan
    from sjd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    eng = lumina_engine(
        size=size,
        target_size=target_size,
        window=window,
        guidance_scale=guidance_scale,
        image_top_k=image_top_k,
        scheme=scheme,
        init=init,
        act_quant=_act_quant_of(quantize),
        model_cfg=model_cfg,
    )
    params = _build_decoder_params(eng.model_cfg, ckpt_dir, quantize,
                                   embed_bits=embed_bits)

    if vq_cfg is None:
        vq_cfg = CHAMELEON_VQ
    if vq_dtype is not None:
        import dataclasses as _dc

        vq_cfg = _dc.replace(vq_cfg, dtype=vq_dtype)
    if vq_ckpt:
        from sjd_tpu.utils.port import load_torch_checkpoint

        vq_params = port_vqgan(load_torch_checkpoint(vq_ckpt), vq_cfg)
    else:
        vq_params = init_vq_params(jax.random.PRNGKey(1), vq_cfg)

    # LM image tokens are a name-derived permutation of the codebook ids
    # (chameleon_vae_ori/vocab.py:56-106); the true mapping comes from the
    # tokenizer's IMGIMG names. The offset fallback keeps tokenizer-free
    # random-weight demos drivable but is NOT the real permutation.
    if tokenizer is not None and hasattr(tokenizer, "get_vocab"):
        mapping = mapping_from_tokenizer(tokenizer)
    else:
        mapping = identity_mapping(vq_cfg.n_embed, 4)

    item_proc = FlexARItemProcessor(
        tokenizer, mapping=mapping, vq_params=vq_params, vq_cfg=vq_cfg
    ) if tokenizer else None

    def _decode_last_image(toks):
        from sjd_tpu.data.item_processor import (
            image_grid_from_block,
            split_generation,
        )

        spans = [s for k, s in split_generation(toks) if k == "image"]
        assert spans, "no image generated"
        grid_ids = image_grid_from_block(
            spans[-1][:-1] if spans[-1][-1] == 8196 else spans[-1],
            mapping=mapping,
        )
        pixels = vq_decode(
            vq_params, vq_cfg, jnp.asarray(grid_ids.reshape(1, -1)), grid_ids.shape
        )
        return _to_pil(np.asarray(pixels[0]))

    def _generate_from_ids(ids, rng_seed):
        prompt_arr = jnp.asarray([ids], jnp.int32)
        res = eng.generate(
            params, jax.random.PRNGKey(rng_seed if rng_seed is not None else seed),
            prompt_arr,
        )
        return res.tokens[0, : int(res.length[0])].tolist()

    def prompt_ids_fn(prompt: str):
        """Text -> full t2i prompt ids (incl. the image-start/size header) —
        the serving seam for StreamingBatcher (examples/demo_server.py)."""
        if item_proc:
            return item_proc.t2i_prompt_ids(prompt, target_size) + [
                IMAGE_START_ID, size_token_id(target_size),
                size_token_id(target_size),
            ]
        h = abs(hash(prompt))
        ids = [(h >> (4 * i)) % 4000 + 9000 for i in range(12)]
        return ids + [IMAGE_START_ID, size_token_id(target_size),
                      size_token_id(target_size)]

    def sample_fn(prompt: str, rng_seed: Optional[int] = None):
        return _decode_last_image(
            _generate_from_ids(prompt_ids_fn(prompt), rng_seed))

    def sample_freeform_fn(qas, images=(), rng_seed: Optional[int] = None):
        """Multi-turn conversation generation (demo_freeform.py): qas is a
        list of [question, answer-or-None] turns whose text may contain
        <|image|> placeholders consumed from ``images`` in order
        (inference_solver.generate images=[...], reference :299-353)."""
        assert item_proc is not None, "image-input prompting needs a tokenizer"
        ids = item_proc.multimodal_prompt_ids(qas, images)
        ids = ids + [IMAGE_START_ID, size_token_id(target_size), size_token_id(target_size)]
        return _decode_last_image(_generate_from_ids(ids, rng_seed))

    def sample_i2i_fn(prompt: str, images, rng_seed: Optional[int] = None):
        """Single-turn image-conditioned generation (demo_image2image.py)."""
        return sample_freeform_fn([[prompt, None]], images, rng_seed)

    smoke = []
    if not ckpt_dir:
        smoke.append("random decoder weights (no ckpt_dir)")
    if not vq_ckpt:
        smoke.append("random VQ decoder (no vq_ckpt)")
    if item_proc is None:
        smoke.append("placeholder prompt ids (no tokenizer)")
    return LoadedModel(
        name="lumina_mgpt", engine=eng, params=params, sample_fn=sample_fn,
        extras=_mark_smoke(
            {"vq_params": vq_params, "vq_cfg": vq_cfg, "nfe": None,
             "mapping": mapping, "item_processor": item_proc,
             "sample_i2i_fn": sample_i2i_fn,
             "sample_freeform_fn": sample_freeform_fn,
             # serving seams (StreamingBatcher in examples/demo_server.py):
             # text -> prompt ids, and generated token row -> PIL image
             "prompt_ids_fn": prompt_ids_fn,
             "decode_image_fn": _decode_last_image},
            "lumina_mgpt", smoke),
    )


def load_emu3(
    ckpt_dir: Optional[str] = None,
    vq_ckpt_dir: Optional[str] = None,
    *,
    h: int = 90,
    w: int = 90,
    window: int = 16,
    guidance_scale: float = 3.0,
    image_top_k: int = 2048,
    scheme: str = "speculative_jacobi",
    init: str = "random",
    tokenizer=None,
    tokenizer_dir: Optional[str] = None,
    negative_prompt_ids=None,
    negative_prompt: Optional[str] = None,
    positive_suffix: Optional[str] = None,
    quantize: bool = True,  # the 8B only fits one 16GB chip with int8 weights
    embed_bits: Optional[int] = None,  # 8 = int8 per-row embedding table —
    # the 184k-vocab bf16 embed is ~1.45 GB; int8 frees ~0.7 GB of slot HBM
    vq_dtype=None,  # e.g. jnp.bfloat16 for batched serving (halves VQ HBM)
    model_cfg=None,  # DecoderConfig override (tiny checkpoint drills) —
    # must keep the Emu3 vocab layout (visual block, special ids)
    vq_cfg=None,  # Emu3VQConfig override, same purpose
) -> LoadedModel:
    from sjd_tpu.data.emu3_processor import build_gen_prompt, extract_image_grid
    from sjd_tpu.models.emu3 import emu3_engine, emu3_grammar_state
    from sjd_tpu.models.vq.emu3_port import port_emu3_vq
    from sjd_tpu.models.vq.emu3_vq import EMU3_VQ, decode as emu3_decode
    from sjd_tpu.utils.emu3_tokenizer import (
        DEFAULT_NEGATIVE_PROMPT,
        DEFAULT_POSITIVE_SUFFIX,
        Emu3Tokenizer,
    )

    from sjd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    # native tiktoken loader (no trust_remote_code): a checkpoint dir holding
    # emu3.tiktoken + emu3_vision_tokens.txt is enough
    if tokenizer is None and tokenizer_dir:
        tokenizer = Emu3Tokenizer(
            os.path.join(tokenizer_dir, "emu3.tiktoken"),
            os.path.join(tokenizer_dir, "emu3_vision_tokens.txt"),
        )

    eng = emu3_engine(
        h=h, w=w, window=window, guidance_scale=guidance_scale,
        image_top_k=image_top_k, scheme=scheme, init=init,
        act_quant=_act_quant_of(quantize),
        model_cfg=model_cfg,
    )
    params = _build_decoder_params(eng.model_cfg, ckpt_dir, quantize,
                                   embed_bits=embed_bits)
    if vq_cfg is None:
        vq_cfg = EMU3_VQ
    if vq_dtype is not None:
        import dataclasses as _dc

        vq_cfg = _dc.replace(vq_cfg, dtype=vq_dtype)
    if vq_ckpt_dir:
        vq_params = port_emu3_vq(_load_sharded_state(vq_ckpt_dir), vq_cfg)
    else:
        # checkpoint-free fallback: random VQ params with the exact ported
        # structure (structure-equality tested vs the torch reference) so the
        # full pipeline stays drivable like the other families (VQ noise).
        from sjd_tpu.models.vq.emu3_port import init_emu3_vq_params

        vq_params = init_emu3_vq_params(1, vq_cfg)
    if vq_dtype is not None:
        # the port/fallback builders emit fp32 leaves; the conv path
        # requires weights in cfg.dtype
        vq_params = jax.tree.map(
            lambda a: a.astype(vq_dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            vq_params,
        )

    if positive_suffix is None:
        positive_suffix = DEFAULT_POSITIVE_SUFFIX
    if negative_prompt is None:
        negative_prompt = DEFAULT_NEGATIVE_PROMPT

    def prompt_ids_fn(prompt: str):
        """Text -> full generation prompt ids (bos + text + boi + "{H}*{W}"
        header + img marker) — the serving seam for StreamingBatcher."""
        if tokenizer is not None:
            # the reference's quality setup (test_emu3.py:56-79): positive
            # suffix appended; the negative prompt is a FULL generation
            # prompt with its own boi + "{H}*{W}" header
            text_ids = list(tokenizer.encode(prompt + positive_suffix))
            tok = lambda s: list(tokenizer.encode(s))  # noqa: E731
        else:
            hsh = abs(hash(prompt))
            text_ids = [(hsh >> (4 * i)) % 1000 + 1000 for i in range(12)]
            tok = lambda s: [1500]  # noqa: E731
        return build_gen_prompt(text_ids, h, w, tok)

    def neg_ids_fn():
        if negative_prompt_ids is not None:
            return list(negative_prompt_ids)
        if tokenizer is not None:
            neg_text_ids = list(tokenizer.encode(negative_prompt))
            tok = lambda s: list(tokenizer.encode(s))  # noqa: E731
        else:
            nh = abs(hash(negative_prompt))
            neg_text_ids = [(nh >> (4 * i)) % 1000 + 1000 for i in range(8)]
            tok = lambda s: [1500]  # noqa: E731
        return build_gen_prompt(neg_text_ids, h, w, tok)

    def decode_image_fn(toks):
        """Generated token row (prompt + generation) -> PIL image."""
        grid = extract_image_grid(toks)
        pixels = emu3_decode(vq_params, vq_cfg, jnp.asarray(grid[None]))
        return _to_pil(np.asarray(pixels[0]))

    def sample_fn(prompt: str, rng_seed: int = 42):
        ids = prompt_ids_fn(prompt)
        res = eng.generate(
            params,
            jax.random.PRNGKey(rng_seed),
            jnp.asarray([ids], jnp.int32),
            neg_prompt=jnp.asarray([neg_ids_fn()], jnp.int32),
            gstate=emu3_grammar_state(1, h, w),
        )
        return decode_image_fn(res.tokens[0, : int(res.length[0])].tolist())

    # Understanding engine (mode='U'), built lazily ONCE: the prompt is
    # left-padded to a fixed bucket so every question reuses one compiled
    # decode loop, and the model fns get a RoPE table long enough for
    # prompt + answer (the generation engine's table stops at its own
    # max_len and the gather would silently clamp late positions).
    u_state: dict = {}

    def _understand_engine(max_new_tokens: int):
        import dataclasses as _dc

        from sjd_tpu.core.engine import SJDEngine
        from sjd_tpu.core.grammar import GrammarSpec
        from sjd_tpu.core.processors import SamplingParams
        from sjd_tpu.models.adapter import decoder_model_fns
        from sjd_tpu.models.emu3 import EOS_ID

        key = ("engine", max_new_tokens)
        if key not in u_state:
            # visual block (h rows of w + eol) + header/template/text budget
            p_bucket = h * (w + 1) + 128
            # max_len budgets GENERATED tokens only (the answer); positions
            # reach prompt + answer, so the RoPE table covers the bucket too
            u_model = decoder_model_fns(
                eng.model_cfg,
                max_positions=max(
                    getattr(eng.model_cfg, "max_position_embeddings", 0) or 0,
                    p_bucket + max_new_tokens + window + 8,
                ),
            )
            u_state[key] = (
                SJDEngine(
                    u_model,
                    _dc.replace(eng.config, cfg_mode="none",
                                max_len=max_new_tokens, eos_id=EOS_ID),
                    GrammarSpec(kind="none"),
                    SamplingParams(do_cfg=False, image_top_k=10, text_top_k=10),
                ),
                p_bucket,
            )
        return u_state[key]

    def understand_fn(question: str, image, rng_seed: int = 42,
                      max_new_tokens: int = 256):
        """Image understanding (mode='U'): pixels -> Emu3VisionVQ tokens ->
        chat prompt (build_understanding_prompt) -> plain AR/SJD text answer.
        No CFG, no image grammar (the reference runs vanilla generate for
        'U'; processing_emu3.py:152-175). Accepts a PIL image or a
        normalized [-1, 1] array; returns generated token ids (decode with
        the tokenizer)."""
        assert tokenizer is not None, "understanding mode needs the tokenizer"
        from sjd_tpu.data.emu3_processor import build_understanding_prompt
        from sjd_tpu.models.emu3 import PAD_ID
        from sjd_tpu.models.vq.emu3_vq import encode as emu3_encode

        arr = _image_to_array(image)
        grid = np.asarray(
            emu3_encode(vq_params, vq_cfg, jnp.asarray(arr[None]))[0], np.int32
        )
        ids = build_understanding_prompt(question, grid,
                                         lambda s: list(tokenizer.encode(s)))
        u_eng, p_bucket = _understand_engine(max_new_tokens)
        assert len(ids) <= p_bucket, (
            f"prompt {len(ids)} tokens exceeds the {p_bucket} bucket"
        )
        pad = p_bucket - len(ids)
        prompt = jnp.asarray([[PAD_ID] * pad + ids], jnp.int32)
        mask = jnp.asarray([[False] * pad + [True] * len(ids)])
        res = u_eng.generate(params, jax.random.PRNGKey(rng_seed),
                             prompt, prompt_mask=mask)
        return res.tokens[0, p_bucket: int(res.length[0])].tolist()

    smoke = []
    if not ckpt_dir:
        smoke.append("random decoder weights (no ckpt_dir)")
    if not vq_ckpt_dir:
        smoke.append("random VisionVQ (no vq_ckpt_dir)")
    if tokenizer is None:
        smoke.append("placeholder prompt ids (no tokenizer)")
    def make_gstate(metas):
        """Per-slot grammar state for StreamingBatcher (all slots share this
        loader's h x w grid)."""
        return emu3_grammar_state(len(metas), h, w)

    return LoadedModel(
        name="emu3", engine=eng, params=params, sample_fn=sample_fn,
        extras=_mark_smoke(
            {"vq_params": vq_params, "vq_cfg": vq_cfg,
             "tokenizer": tokenizer, "negative_prompt": negative_prompt,
             "understand_fn": understand_fn,
             # serving seams (StreamingBatcher in examples/demo_server.py)
             "prompt_ids_fn": prompt_ids_fn, "neg_ids_fn": neg_ids_fn,
             "decode_image_fn": decode_image_fn, "make_gstate": make_gstate},
            "emu3", smoke),
    )


def load_llamagen(
    gpt_ckpt: Optional[str] = None,
    vq_ckpt: Optional[str] = None,
    *,
    name: str = "GPT-XL",
    latent_size: int = 16,
    model_type: str = "c2i",
    cls_token_num: Optional[int] = None,
    window: int = 16,
    guidance_scale: float = 7.5,
    image_top_k: int = 1000,
    scheme: str = "speculative_jacobi",
    init: str = "random",
    t5_dir: Optional[str] = None,
    quantize=False,
    embed_bits: Optional[int] = None,
    model_cfg=None,  # DecoderConfig override (tiny checkpoint drills);
    # rope_2d_grid_side must match latent_size
    vq_cfg=None,  # VQConfig override, same purpose
) -> LoadedModel:
    from sjd_tpu.models.llamagen import (
        embed_caption,
        embed_class,
        embed_uncond_caption,
        embed_uncond_class,
        init_cond_params,
        llamagen_engine,
    )
    from sjd_tpu.models.vq import LLAMAGEN_VQ16, decode as vq_decode, init_vq_params, port_vqgan
    from sjd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    if cls_token_num is None:
        cls_token_num = 1 if model_type == "c2i" else 120
    eng = llamagen_engine(
        name=name, latent_size=latent_size, cls_token_num=cls_token_num,
        window=window, guidance_scale=guidance_scale, image_top_k=image_top_k,
        scheme=scheme, init=init, act_quant=_act_quant_of(quantize),
        model_cfg=model_cfg,
    )
    if gpt_ckpt:
        from sjd_tpu.utils.port import load_torch_checkpoint, port_llamagen

        params, cond = port_llamagen(load_torch_checkpoint(gpt_ckpt), eng.model_cfg)
        if quantize:
            params = quantize_ported_params(params, eng.model_cfg, quantize,
                                            embed_bits=embed_bits)
    else:
        params = _build_decoder_params(eng.model_cfg, None, quantize,
                                       embed_bits=embed_bits)
        cond = init_cond_params(jax.random.PRNGKey(1), eng.model_cfg,
                                model_type=model_type)
    if vq_cfg is None:
        vq_cfg = LLAMAGEN_VQ16
    if vq_ckpt:
        from sjd_tpu.utils.port import load_torch_checkpoint

        vq_params = port_vqgan(load_torch_checkpoint(vq_ckpt), vq_cfg,
                               style="llamagen")
    else:
        vq_params = init_vq_params(jax.random.PRNGKey(2), vq_cfg)

    t5 = None
    if model_type == "t2i" and t5_dir:
        from sjd_tpu.models.t5 import T5Embedder

        t5 = T5Embedder(t5_dir)

    dtype = eng.model_cfg.dtype

    def embed_prompt_fn(prompt):
        """Prompt (class label for c2i, caption for t2i) -> per-request
        (prompt_embeds [P, D], neg_prompt_embeds [P, D], prompt_mask [P] or
        None) — the serving seam for StreamingBatcher(embed_dim=...)."""
        B = 1
        if model_type == "c2i":
            label = int(prompt)
            pe = embed_class(cond, jnp.asarray([label], jnp.int32), dtype)
            ne = embed_uncond_class(cond, B, dtype)
            pmask = None
        else:
            assert t5 is not None, "t2i requires a T5 checkpoint dir"
            feats, emb_mask = t5.get_text_embeddings([str(prompt)])
            pe = embed_caption(cond, jnp.asarray(feats), dtype)
            ne = embed_uncond_caption(cond, B, dtype)
            # left-padded zero-embedding caption rows must be attention-
            # masked (the reference passes emb_masks; attending them with
            # softmax weight exp(0) dilutes the real caption conditioning)
            pmask = jnp.asarray(emb_mask, bool)
        return pe, ne, pmask

    def decode_image_fn(toks):
        """Generated token row -> PIL image (VQ decode of the image block)."""
        ids = jnp.asarray(toks, jnp.int32)[None,
                                           cls_token_num : cls_token_num
                                           + latent_size * latent_size]
        pixels = vq_decode(vq_params, vq_cfg, ids, (latent_size, latent_size))
        return _to_pil(np.asarray(pixels[0]))

    def sample_fn(prompt, rng_seed: int = 42):
        pe, ne, pmask = embed_prompt_fn(prompt)
        res = eng.generate(
            params, jax.random.PRNGKey(rng_seed),
            prompt_embeds=pe, neg_prompt_embeds=ne, prompt_mask=pmask,
        )
        return decode_image_fn(
            res.tokens[0, : int(res.length[0])].tolist())

    smoke = []
    if not gpt_ckpt:
        smoke.append("random GPT weights (no gpt_ckpt)")
    if not vq_ckpt:
        smoke.append("random VQ decoder (no vq_ckpt)")
    if model_type == "t2i" and t5 is None:
        smoke.append("no T5 encoder (t2i prompts unusable until t5_dir given)")
    return LoadedModel(
        name=f"llamagen-{name}", engine=eng, params=params, sample_fn=sample_fn,
        extras=_mark_smoke(
            {"vq_params": vq_params, "vq_cfg": vq_cfg, "cond": cond, "t5": t5,
             # serving seams (StreamingBatcher embed mode, demo_server
             # --slots): per-request conditioning embeds + token decode
             "embed_prompt_fn": embed_prompt_fn,
             "decode_image_fn": decode_image_fn,
             "prompt_width": cls_token_num,
             "embed_dim": getattr(eng.model_cfg, "hidden_size", 0)},
            f"llamagen-{name}", smoke),
    )


def load_anole(
    ckpt_dir: Optional[str] = None,
    vq_ckpt: Optional[str] = None,
    *,
    window: int = 16,
    guidance_scale: float = 7.0,
    image_top_k: int = 2000,
    text_top_k: int = 10,
    scheme: str = "speculative_jacobi",
    init: str = "random",
    multimodal_generation_mode: str = "image-only",
    tokenizer=None,
    quantize: bool = False,
    embed_bits: Optional[int] = None,
    model_cfg=None,  # DecoderConfig override (tiny checkpoint drills)
    vq_cfg=None,  # VQConfig override, same purpose
    image_seq_length: int = 1024,  # tokens per image (32x32 latents)
) -> LoadedModel:
    """HF-Chameleon / Anole-7b: fixed 1024-token images after <boi>
    (scheduler/jacobi_iteration_anhole.py). The VQ decoder shares the
    Chameleon VQGAN (models/vq CHAMELEON_VQ)."""
    from sjd_tpu.data.vocab_translation import (
        bpe_to_img,
        identity_mapping,
        mapping_from_tokenizer,
    )
    from sjd_tpu.models.anole import BOI_ID, anole_engine
    from sjd_tpu.models.vq import (
        CHAMELEON_VQ,
        decode as vq_decode,
        init_vq_params,
        port_vqgan,
    )

    from sjd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    eng = anole_engine(
        window=window, guidance_scale=guidance_scale, image_top_k=image_top_k,
        text_top_k=text_top_k, scheme=scheme, init=init,
        multimodal_generation_mode=multimodal_generation_mode,
        act_quant=_act_quant_of(quantize),
        model_cfg=model_cfg, image_seq_length=image_seq_length,
    )
    params = _build_decoder_params(eng.model_cfg, ckpt_dir, quantize,
                                   embed_bits=embed_bits)
    if vq_cfg is None:
        vq_cfg = CHAMELEON_VQ
    if vq_ckpt:
        from sjd_tpu.utils.port import load_torch_checkpoint

        vq_params = port_vqgan(load_torch_checkpoint(vq_ckpt), vq_cfg)
    else:
        vq_params = init_vq_params(jax.random.PRNGKey(1), vq_cfg)

    # bpe->codebook permutation (anole/modeling_chameleon.py:1562-1626,
    # convert_bpe2img_tokens); offset fallback for tokenizer-free demos
    if tokenizer is not None and hasattr(tokenizer, "get_vocab"):
        mapping = mapping_from_tokenizer(tokenizer)
    else:
        mapping = identity_mapping(vq_cfg.n_embed, 4)

    from sjd_tpu.models.anole import normalize_mode

    mode = normalize_mode(multimodal_generation_mode)

    def prompt_ids_fn(prompt: str):
        """Text -> prompt ids (with <boi> appended for image-only mode) —
        the serving seam for StreamingBatcher."""
        if tokenizer is not None:
            ids = list(tokenizer.encode(prompt))
        else:
            h = abs(hash(prompt))
            ids = [(h >> (4 * i)) % 4000 + 9000 for i in range(12)]
        if mode == "image-only":
            ids = ids + [BOI_ID]
        return ids

    def _generate_ids(prompt: str, rng_seed: int):
        ids = prompt_ids_fn(prompt)
        res = eng.generate(
            params, jax.random.PRNGKey(rng_seed), jnp.asarray([ids], jnp.int32)
        )
        return ids, res.tokens[0, : int(res.length[0])].tolist()

    import math as _math

    isl = image_seq_length
    side = _math.isqrt(isl)
    assert side * side == isl, "image_seq_length must be a square grid"

    def _decode_image_span(toks, start):
        """image_seq_length-token image span -> pixels (decode_image_tokens
        trim, reference jacobi_iteration_anhole.py:290-316; 1024 = 32x32)."""
        grid = np.asarray(toks[start : start + isl], np.int32).reshape(side, side)
        grid = bpe_to_img(mapping, grid)  # reference :1606-1626
        pixels = vq_decode(vq_params, vq_cfg, jnp.asarray(grid.reshape(1, -1)),
                           (side, side))
        return _to_pil(np.asarray(pixels[0]))

    def sample_fn(prompt: str, rng_seed: int = 42):
        ids, toks = _generate_ids(prompt, rng_seed)
        if mode == "text-only":
            return toks[len(ids):]  # token ids; detokenization is the caller's
        gen = toks[len(ids):]
        if mode == "image-only":
            start = len(ids)  # <boi> was appended to the prompt
        else:  # interleaved / unrestricted: first complete image span
            rel = next(
                (k + 1 for k, t in enumerate(gen)
                 if t == BOI_ID and len(gen) - k > isl), None
            )
            assert rel is not None, "no complete image in the generation"
            start = len(ids) + rel
        return _decode_image_span(toks, start)

    def decode_image_fn(toks):
        """Generated token row -> PIL image: first <boi> followed by a full
        image_seq_length-token span (pad/prompt-position agnostic, so it
        works on left-padded StreamingBatcher rows too)."""
        toks = [int(t) for t in toks]
        start = next(
            (k + 1 for k, t in enumerate(toks)
             if t == BOI_ID and len(toks) - k > isl), None)
        assert start is not None, "no complete image in the generation"
        return _decode_image_span(toks, start)

    def encode_image_fn(image) -> list:
        """pixels -> VQ tokens -> BPE image-token ids (get_image_tokens,
        anole/modeling_chameleon.py:1588-1604); callers splice them between
        <boi>/<eoi> for interleaved image-in-prompt generation."""
        from sjd_tpu.data.vocab_translation import img_to_bpe as _i2b
        from sjd_tpu.models.vq import encode as vq_encode

        arr = _image_to_array(image)
        ids = vq_encode(vq_params, vq_cfg, jnp.asarray(arr[None]))
        return _i2b(mapping, np.asarray(ids[0], np.int32)).tolist()

    smoke = []
    if not ckpt_dir:
        smoke.append("random decoder weights (no ckpt_dir)")
    if not vq_ckpt:
        smoke.append("random VQ decoder (no vq_ckpt)")
    if tokenizer is None:
        smoke.append("placeholder prompt ids + offset vocab mapping (no tokenizer)")
    return LoadedModel(
        name="anole", engine=eng, params=params, sample_fn=sample_fn,
        extras=_mark_smoke(
            {"vq_params": vq_params, "vq_cfg": vq_cfg, "mapping": mapping,
             "multimodal_generation_mode": multimodal_generation_mode,
             "encode_image_fn": encode_image_fn,
             # serving seams (StreamingBatcher in examples/demo_server.py)
             "prompt_ids_fn": prompt_ids_fn,
             "decode_image_fn": decode_image_fn,
             "boi_id": BOI_ID},
            "anole", smoke),
    )


_REGISTRY = {
    "lumina_mgpt": load_lumina_mgpt,
    "anole": load_anole,
    "emu3": load_emu3,
    "llamagen": load_llamagen,
}


def load_pretrained_model(model_name: str, **kwargs) -> LoadedModel:
    """Dispatch by name substring (model_loader.py:347-359)."""
    for key, fn in _REGISTRY.items():
        if key in model_name.lower():
            return fn(**kwargs)
    raise ValueError(f"unknown model {model_name!r}; known: {list(_REGISTRY)}")
