"""Data-layer and eval-harness tests."""

import json
import os

import numpy as np
import pytest

from sjd_tpu.data import emu3_processor as E
from sjd_tpu.data import item_processor as I
from sjd_tpu.eval import PromptRecord, frechet_distance, inception_score, clip_score
from sjd_tpu.eval import shard_prompts, run_prompt_set, workdir_name


def test_flexar_image_block_roundtrip():
    rs = np.random.RandomState(0)
    grid = rs.randint(4, 8196, (48, 48)).astype(np.int32)
    block = I.image_block_from_grid(grid, 768, 768)
    # layout: start + 2 size + 48*(48+1) + end
    assert len(block) == 3 + 48 * 49 + 1
    assert block[0] == I.IMAGE_START_ID and block[-1] == I.IMAGE_END_ID
    assert block[1] == block[2] == I.SIZE_TOKEN_BASE + 24
    back = I.image_grid_from_block(block[:-1])
    np.testing.assert_array_equal(back, grid)


def test_split_generation():
    grid = np.random.RandomState(1).randint(4, 8196, (2, 2)).astype(np.int32)
    block = I.image_block_from_grid(grid, 32, 32)
    toks = [100, 101] + block + [102]
    spans = I.split_generation(toks)
    kinds = [k for k, _ in spans]
    assert kinds == ["text", "image", "text"]
    np.testing.assert_array_equal(I.image_grid_from_block(spans[1][1][:-1]), grid)


def test_emu3_prompt_and_extract():
    text = [5, 6, 7]
    prompt = E.build_gen_prompt(text, 4, 3, tokenize=lambda s: [900, 901])
    assert prompt[0] == E.BOS_ID and prompt[-1] == E.IMG_ID
    assert E.BOI_ID in prompt

    # synth generation: 4 rows of 3 visual tokens + eol, then eof/eoi/eos
    rs = np.random.RandomState(2)
    grid = rs.randint(0, 32768, (4, 3))
    gen = list(prompt)
    for r in range(4):
        gen += [int(c) + E.VISUAL_START for c in grid[r]] + [E.EOL_ID]
    gen += [E.EOF_ID, E.EOI_ID, E.EOS_ID]
    out = E.extract_image_grid(gen)
    np.testing.assert_array_equal(out, grid)


def test_emu3_generate_size():
    h, w = E.calculate_generate_size("1:1", 720 * 720)
    assert (h, w) == (90, 90)


def test_shard_prompts_partition():
    recs = [PromptRecord(index=i, prompt=str(i)) for i in range(103)]
    seen = []
    for node in range(2):
        for wk in range(4):
            shard = shard_prompts(recs, node_id=node, num_nodes=2,
                                  worker_id=wk, num_workers=4)
            seen += [r.index for r in shard]
    assert sorted(seen) == list(range(103))  # exact partition, no overlap


def test_run_prompt_set_idempotent(tmp_path):
    from PIL import Image

    calls = []

    def sample(prompt):
        calls.append(prompt)
        return Image.new("RGB", (8, 8))

    recs = [PromptRecord(index=i, prompt=f"p{i}") for i in range(3)]
    wd = str(tmp_path / "out")
    stats = run_prompt_set(sample, recs, wd, log_every=0)
    assert stats["generated"] == 3
    stats2 = run_prompt_set(sample, recs, wd, log_every=0)
    assert stats2["generated"] == 0 and stats2["skipped_existing"] == 3
    assert len(calls) == 3  # resume did not regenerate


def test_metric_math():
    rs = np.random.RandomState(3)
    a = rs.randn(200, 16)
    assert frechet_distance(a, a + 0.0) < 1e-6
    b = rs.randn(200, 16) + 3.0
    assert frechet_distance(a, b) > 50

    sharp = np.full((100, 10), 1e-6)
    sharp[np.arange(100), np.arange(100) % 10] = 1.0
    sharp /= sharp.sum(1, keepdims=True)
    uniform = np.full((100, 10), 0.1)
    assert inception_score(sharp)[0] > inception_score(uniform)[0]

    e = rs.randn(50, 8)
    assert clip_score(e, e) == pytest.approx(100.0, abs=1e-3)


def test_workdir_name_deterministic():
    a = workdir_name("lumina", cfg=3.0, window=16)
    b = workdir_name("lumina", window=16, cfg=3.0)
    assert a == b and "lumina" in a


def test_smoke_extractors_score_pipeline(tmp_path):
    """Checkpoint-free pixel extractors drive the full FID/IS math: FID of a
    directory against itself is ~0 and IS is finite on tiny sets (the
    documented eval_model.py --smoke-extractor path)."""
    import numpy as np
    from PIL import Image

    from sjd_tpu.eval.metrics import (
        evaluate_quantitative_scores,
        make_pixel_extractor,
        make_pixel_probs,
    )

    rs = np.random.RandomState(0)
    d = tmp_path / "gen"
    d.mkdir()
    for i in range(4):
        arr = (rs.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i}.png")

    s = evaluate_quantitative_scores(
        str(d), str(d), feature_fn=make_pixel_extractor(),
        probs_fn=make_pixel_probs(),
    )
    assert s["n_images"] == 4
    assert abs(s["fid"]) < 1e-4
    assert np.isfinite(s["inception_score"])


def test_demo_server_dispatch_routes():
    """The model-worker dispatch serves t2i / i2i / freeform through the
    loader extras (demo_image2image.py / demo_freeform.py parity)."""
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "demo_server", "examples/demo_server.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    calls = []

    def dispatch(kind, req):
        calls.append((kind, tuple(sorted(req))))
        return f"img:{kind}"

    w = mod.ModelWorker(dispatch)
    w.start()
    w.ready.wait()
    assert w.generate("t2i", {"prompt": "x"})[:2] == ("ok", "img:t2i")
    assert w.generate("i2i", {"prompt": "x", "images": []})[1] == "img:i2i"
    assert w.generate("freeform", {"qas": []})[1] == "img:freeform"
    assert [k for k, _ in calls] == ["t2i", "i2i", "freeform"]


def test_run_prompt_set_batched_resume(tmp_path):
    """Batched eval runner (run_prompt_set_batched): streams pending prompts
    through engine slots via the loader serving seams, writes {index}.png
    atomically as slots finish, and preserves skip-existing resume."""
    import numpy as np
    from PIL import Image

    from sjd_tpu.core import SamplingParams
    from sjd_tpu.eval.datasets import PromptRecord
    from sjd_tpu.eval.harness import run_prompt_set_batched

    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import TINY_GRAMMAR, make_engine, tiny_params

    eng = make_engine(
        window=5, scheme="speculative_jacobi", max_len=64, cfg_mode="none",
        grammar=TINY_GRAMMAR,
        sampling=SamplingParams(do_cfg=False, image_top_k=44, text_top_k=60),
        eos_id=49,
    )
    params = tiny_params()

    def prompt_ids_fn(prompt):
        # size token from the prompt text -> divergent grid sizes
        return [1, 2, 48, 53 + (len(prompt) % 2), 53 + (len(prompt) % 2)]

    def decode_image_fn(toks):
        px = (np.asarray(toks[-4:], np.uint8) % 16) * 16
        return Image.fromarray(np.tile(px, (4, 1)).astype(np.uint8), "L")

    class FakeModel:
        engine = eng
        extras = {"prompt_ids_fn": prompt_ids_fn,
                  "decode_image_fn": decode_image_fn}
    FakeModel.params = params

    records = [PromptRecord(index=i, prompt="p" * (i + 1)) for i in range(5)]
    wd = str(tmp_path / "wd")
    stats = run_prompt_set_batched(FakeModel, records, wd, slots=2,
                                   chunk_steps=8)
    assert stats["generated"] == 5 and stats["skipped_existing"] == 0
    assert all(os.path.exists(os.path.join(wd, f"{i}.png")) for i in range(5))

    # resume: everything exists -> nothing regenerates, no engine work
    stats2 = run_prompt_set_batched(FakeModel, records, wd, slots=2)
    assert stats2["generated"] == 0 and stats2["skipped_existing"] == 5


def test_run_prompt_set_batched_embed_mode(tmp_path):
    """Embedding-mode batched eval (LlamaGen c2i): wave-limited lazy
    submission, every prompt produces a PNG."""
    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from sjd_tpu.core import EngineConfig, SamplingParams, SJDEngine
    from sjd_tpu.eval.datasets import PromptRecord
    from sjd_tpu.eval.harness import run_prompt_set_batched
    from sjd_tpu.models import DecoderConfig, decoder_model_fns, init_params
    from sjd_tpu.models.llamagen import (
        LLAMAGEN_GRAMMAR,
        embed_class,
        embed_uncond_class,
        init_cond_params,
    )

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
    eng = SJDEngine(
        decoder_model_fns(cfg, max_positions=64),
        EngineConfig(window=5, interval_r=block - 7, max_len=1 + block,
                     eos_id=-1, cfg_mode="neg_prompt"),
        LLAMAGEN_GRAMMAR,
        SamplingParams(do_cfg=True, guidance_scale=4.0, image_top_k=32,
                       text_top_k=32),
    )

    def embed_prompt_fn(prompt):
        pe = embed_class(cond, jnp.asarray([int(prompt)], jnp.int32),
                         jnp.float32)
        ne = embed_uncond_class(cond, 1, jnp.float32)
        return pe, ne, None

    def decode_image_fn(toks):
        px = (np.asarray(toks[1 : 1 + block], np.uint8) % 16) * 16
        return Image.fromarray(px.reshape(latent, latent), "L")

    class FakeModel:
        engine = eng
        extras = {"embed_prompt_fn": embed_prompt_fn,
                  "decode_image_fn": decode_image_fn,
                  "prompt_width": 1, "embed_dim": cfg.hidden_size}
    FakeModel.params = params

    records = [PromptRecord(index=i, prompt=str(i % 10)) for i in range(5)]
    wd = str(tmp_path / "wd")
    stats = run_prompt_set_batched(FakeModel, records, wd, slots=2,
                                   chunk_steps=4)
    assert stats["generated"] == 5
    assert all(os.path.exists(os.path.join(wd, f"{i}.png")) for i in range(5))
