"""Continuous batching (VERDICT r2 weak #4): SJDEngine.refill re-arms
finished slots from a prompt queue between resume() chunks, while every
live slot's trajectory — including its own per-slot rng stream — stays
bit-exact vs a no-refill run. Per-request seed reproducibility
(VERDICT r3 #2) is pinned at the bottom of this file."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sjd_tpu.core import SamplingParams
from sjd_tpu.core.serving import ContinuousBatcher

from helpers import TINY, TINY_GRAMMAR, make_engine, tiny_params


def grammar_engine(max_len=64, window=5):
    """Engine with the tiny image grammar: prompt [.., 48, size, size] opens
    a grid whose size token sets the latent dims — different size tokens
    give naturally divergent generation lengths (the continuous-batching
    scenario)."""
    # eos = the image-end token, so each slot's generation length is purely
    # its grid size (49 is grammar-forced at the exact grid end)
    return make_engine(
        window=window, scheme="speculative_jacobi", max_len=max_len,
        cfg_mode="none", grammar=TINY_GRAMMAR,
        sampling=SamplingParams(do_cfg=False, image_top_k=44, text_top_k=60),
        eos_id=49,
    )


def grid_prompt(size_tok):
    # 48 = image start, then two size tokens (h, w)
    return [1, 2, 48, size_tok, size_tok]


def gen_tokens_for(eng, params, prompt_rows, seed=0):
    res = eng.generate(
        params, jax.random.PRNGKey(seed), jnp.asarray(prompt_rows, jnp.int32)
    )
    return [
        np.asarray(res.tokens[b, : int(res.length[b])]) for b in range(len(prompt_rows))
    ]


def test_refill_preserves_live_slots_bit_exactly():
    """Slot 0 finishes early (2x2 grid), slot 1 runs long (4x4): refilling
    slot 0 mid-flight must not change slot 1's final tokens."""
    params = tiny_params()
    eng = grammar_engine()
    prompts = [grid_prompt(53), grid_prompt(54)]  # sizes 2 and 4

    # ground truth without any refill (single uninterrupted generate)
    want = gen_tokens_for(eng, params, prompts)

    # chunked run with a refill of slot 0 once it finishes
    res, state = eng.generate(
        params, jax.random.PRNGKey(0), jnp.asarray(prompts, jnp.int32),
        max_steps=4, return_state=True,
    )
    refilled = False
    for _ in range(64):
        fin = np.asarray(state.finished)
        if fin.all():
            break
        if fin[0] and not refilled:
            state = eng.refill(
                params, state,
                jnp.asarray([grid_prompt(53), grid_prompt(53)], jnp.int32),
                np.asarray([True, False]),
            )
            refilled = True
        res, state = eng.resume(params, state, max_steps=4, return_state=True)
    assert refilled, "slot 0 never finished — test setup broken"
    got1 = np.asarray(state.tokens[1, : int(state.length[1])])
    np.testing.assert_array_equal(got1, want[1])


def test_refill_slot_regenerates_valid_grammar():
    """The refilled slot must produce a structurally valid image for its NEW
    prompt (fresh KV prefill + grammar re-arm)."""
    params = tiny_params()
    eng = grammar_engine()
    prompts = [grid_prompt(53), grid_prompt(54)]
    res, state = eng.generate(
        params, jax.random.PRNGKey(0), jnp.asarray(prompts, jnp.int32),
        max_steps=200, return_state=True,
    )
    assert bool(np.asarray(state.finished)[0])
    # refill slot 0 with a 4x4-grid prompt and run to completion
    state = eng.refill(
        params, state,
        jnp.asarray([grid_prompt(54), grid_prompt(54)], jnp.int32),
        np.asarray([True, False]),
    )
    res, state = eng.resume(params, state, max_steps=400, return_state=True)
    assert bool(np.asarray(state.finished).all())
    toks = np.asarray(state.tokens[0, 5 : int(state.length[0])])
    # 4 rows of (4 image tokens + newline 50) then image end 49
    i = 0
    for _ in range(4):
        assert all(4 <= t <= 47 for t in toks[i : i + 4]), toks
        assert toks[i + 4] == 50
        i += 5
    assert toks[i] == 49


def test_refill_counts_one_forward():
    params = tiny_params()
    eng = grammar_engine()
    prompts = [grid_prompt(53), grid_prompt(53)]
    res, state = eng.generate(
        params, jax.random.PRNGKey(0), jnp.asarray(prompts, jnp.int32),
        max_steps=200, return_state=True,
    )
    nfe0 = int(state.nfe)
    state = eng.refill(
        params, state, jnp.asarray(prompts, jnp.int32),
        np.asarray([True, False]),
    )
    assert int(state.nfe) == nfe0 + 1


def test_continuous_batcher_stream():
    """6 prompts through 2 slots: every prompt completes with a valid grid
    for its own size token, in stream order."""
    params = tiny_params()
    eng = grammar_engine()
    sizes = [53, 54, 53, 54, 53, 53]  # grids 2x2 / 4x4
    prompts = np.asarray([grid_prompt(s) for s in sizes], np.int32)

    batcher = ContinuousBatcher(eng, params, chunk_steps=8)
    done = batcher.run(jax.random.PRNGKey(0), prompts, batch=2)
    assert [c.prompt_index for c in done] == list(range(6))
    for c, size_tok in zip(done, sizes):
        side = (size_tok - 52) * 2
        toks = c.tokens[5:]
        i = 0
        for _ in range(side):
            assert all(4 <= t <= 47 for t in toks[i : i + side])
            assert toks[i + side] == 50
            i += side + 1
        assert toks[i] == 49


def test_continuous_batcher_single_chunk_tail():
    """Queue shorter than the batch: dead slots idle out cleanly."""
    params = tiny_params()
    eng = grammar_engine()
    prompts = np.asarray([grid_prompt(53)], np.int32)
    batcher = ContinuousBatcher(eng, params, chunk_steps=16)
    done = batcher.run(jax.random.PRNGKey(1), prompts, batch=4)
    assert len(done) == 1 and done[0].prompt_index == 0


def test_refill_under_neg_prompt_cfg():
    """Emu3-style CFG (separate left-padded negative prompt): refill must
    rebuild BOTH halves of the doubled batch for the refilled slot and
    leave the live slot's cond+uncond KV untouched."""
    from sjd_tpu.core import SamplingParams
    from helpers import TINY_GRAMMAR, make_engine, tiny_params

    params = tiny_params()
    eng = make_engine(
        window=5, scheme="speculative_jacobi", max_len=64,
        cfg_mode="neg_prompt", grammar=TINY_GRAMMAR,
        sampling=SamplingParams(do_cfg=True, guidance_scale=2.0,
                                image_top_k=44, text_top_k=60),
        eos_id=49,
    )
    prompts = [grid_prompt(53), grid_prompt(54)]
    neg = [[7, 8, 48, 53, 53], [7, 8, 48, 54, 54]]

    want = eng.generate(
        params, jax.random.PRNGKey(0), jnp.asarray(prompts, jnp.int32),
        neg_prompt=jnp.asarray(neg, jnp.int32),
    )
    want1 = np.asarray(want.tokens[1, : int(want.length[1])])

    res, state = eng.generate(
        params, jax.random.PRNGKey(0), jnp.asarray(prompts, jnp.int32),
        neg_prompt=jnp.asarray(neg, jnp.int32),
        max_steps=4, return_state=True,
    )
    refilled = False
    for _ in range(64):
        fin = np.asarray(state.finished)
        if fin.all():
            break
        if fin[0] and not refilled:
            state = eng.refill(
                params, state,
                jnp.asarray([grid_prompt(53)] * 2, jnp.int32),
                np.asarray([True, False]),
                neg_prompt=jnp.asarray([neg[0]] * 2, jnp.int32),
            )
            refilled = True
        res, state = eng.resume(params, state, max_steps=4, return_state=True)
    assert refilled
    got1 = np.asarray(state.tokens[1, : int(state.length[1])])
    np.testing.assert_array_equal(got1, want1)
    # refilled slot produced a structurally valid 2x2 grid
    toks = np.asarray(state.tokens[0, 5 : int(state.length[0])])
    assert all(4 <= t <= 47 for t in toks[0:2]) and toks[2] == 50


def test_refill_with_embedding_prompts():
    """LlamaGen-style conditioning: the refill path re-prefills a slot from
    prompt EMBEDDINGS (class/caption prefix) while the live slot continues
    bit-exactly."""
    from sjd_tpu.core import EngineConfig, GrammarSpec, SJDEngine
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
    model = decoder_model_fns(cfg, max_positions=64)
    eng = SJDEngine(
        model,
        EngineConfig(window=5, interval_r=block - 7, max_len=1 + block,
                     eos_id=-1, cfg_mode="neg_prompt"),
        LLAMAGEN_GRAMMAR,
        SamplingParams(do_cfg=True, guidance_scale=4.0, image_top_k=32,
                       text_top_k=32),
    )
    labels = jnp.asarray([3, 7], jnp.int32)
    pe = embed_class(cond, labels, jnp.float32)
    ne = embed_uncond_class(cond, 2, jnp.float32)

    want = eng.generate(params, jax.random.PRNGKey(1), prompt_embeds=pe,
                        neg_prompt_embeds=ne)
    want1 = np.asarray(want.tokens[1, : int(want.length[1])])

    res, state = eng.generate(params, jax.random.PRNGKey(1), prompt_embeds=pe,
                              neg_prompt_embeds=ne, max_steps=3,
                              return_state=True)
    # c2i images are fixed-length so slots finish together; force the
    # refill of slot 0 MID-FLIGHT (the mechanism doesn't require the slot
    # to be finished) and check the live slot 1 is unperturbed
    pe2 = embed_class(cond, jnp.asarray([5, 5], jnp.int32), jnp.float32)
    state = eng.refill(params, state, None, np.asarray([True, False]),
                       prompt_embeds=pe2, neg_prompt_embeds=ne)
    for _ in range(32):
        if bool(np.asarray(state.finished).all()):
            break
        res, state = eng.resume(params, state, max_steps=3, return_state=True)
    got1 = np.asarray(state.tokens[1, : int(state.length[1])])
    np.testing.assert_array_equal(got1, want1)
    # the refilled slot regenerated a full fixed-length image for label 5
    assert int(state.length[0]) >= 1 + block


def test_continuous_batcher_data_parallel_bit_exact():
    """Slots sharded over the 'data' mesh axis (row_sharding): the whole
    chunked stream — generate, harvest, refill, resume — runs SPMD and
    reproduces the single-device batcher bit-exactly. This is the multi-chip
    continuous-serving configuration (the reference's nearest analogue is
    process-per-GPU prompt sharding with B=1 and no refill at all)."""
    from sjd_tpu.parallel import make_mesh

    params = tiny_params()
    eng = grammar_engine()
    sizes = [53, 54, 53, 54, 53, 53, 54, 53]
    prompts = np.asarray([grid_prompt(s) for s in sizes], np.int32)

    want = ContinuousBatcher(eng, params, chunk_steps=8).run(
        jax.random.PRNGKey(0), prompts, batch=4
    )

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    rows = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")
    )
    with jax.set_mesh(mesh):
        got = ContinuousBatcher(
            eng, params, chunk_steps=8, row_sharding=rows
        ).run(jax.random.PRNGKey(0), prompts, batch=4)

    assert [c.prompt_index for c in got] == [c.prompt_index for c in want]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g.tokens, w.tokens)
        assert g.gen_count == w.gen_count


def test_continuous_batcher_neg_prompt_stream():
    """The Emu3 serving configuration end-to-end through the batcher:
    neg-prompt CFG (separate left-padded negative per stream prompt) +
    make_gstate, streamed with refill. Every completion must carry a valid
    grid for its own size token."""
    from sjd_tpu.core import SamplingParams
    from helpers import TINY_GRAMMAR, make_engine, tiny_params

    params = tiny_params()
    eng = make_engine(
        window=5, scheme="speculative_jacobi", max_len=64,
        cfg_mode="neg_prompt", grammar=TINY_GRAMMAR,
        sampling=SamplingParams(do_cfg=True, guidance_scale=2.0,
                                image_top_k=44, text_top_k=60),
        eos_id=49,
    )
    sizes = [53, 54, 53, 53, 54]
    prompts = np.asarray([grid_prompt(s) for s in sizes], np.int32)
    negs = np.asarray([[7, 8, 48, s, s] for s in sizes], np.int32)

    batcher = ContinuousBatcher(eng, params, chunk_steps=8)
    done = batcher.run(jax.random.PRNGKey(0), prompts, batch=2,
                       neg_prompts=negs)
    assert [c.prompt_index for c in done] == list(range(len(sizes)))
    for c, size_tok in zip(done, sizes):
        side = (size_tok - 52) * 2
        toks = c.tokens[5:]
        i = 0
        for _ in range(side):
            assert all(4 <= t <= 47 for t in toks[i : i + side])
            assert toks[i + side] == 50
            i += side + 1
        assert toks[i] == 49


def test_streaming_batcher_online_submissions():
    """StreamingBatcher (the demo_server --slots path): requests submitted
    over time from other threads share 2 engine slots; every request
    completes with a valid grid for its own size token, including ones
    that arrive while the batch is mid-flight (admitted by mid-flight
    refill of idle slots or chunk-boundary refill of finished ones)."""
    import threading
    import time as _time

    from sjd_tpu.core.serving import StreamingBatcher

    params = tiny_params()
    eng = grammar_engine()
    sb = StreamingBatcher(eng, params, batch=2, chunk_steps=8,
                          prompt_width=5)

    sizes = [53, 54, 53, 53, 54]
    handles = [sb.submit(grid_prompt(sizes[0]), seed=0)]

    def late_submitter():
        for s in sizes[1:]:
            _time.sleep(0.3)
            handles.append(sb.submit(grid_prompt(s), seed=1))

    t = threading.Thread(target=late_submitter)
    t.start()
    t.join()
    results = [h.wait(timeout=120) for h in handles]
    sb.close()

    for res, size_tok in zip(results, sizes):
        toks = res.tokens[5:]
        side = (size_tok - 52) * 2
        i = 0
        for _ in range(side):
            assert all(4 <= t <= 47 for t in toks[i : i + side]), toks
            assert toks[i + side] == 50
            i += side + 1
        assert toks[i] == 49
        assert res.gen_count == len(toks)


def test_streaming_batcher_short_prompt_padding():
    """A prompt shorter than the bucket is left-padded with mask=False and
    still produces a valid grid."""
    from sjd_tpu.core.serving import StreamingBatcher

    params = tiny_params()
    eng = grammar_engine()
    sb = StreamingBatcher(eng, params, batch=2, chunk_steps=8,
                          prompt_width=9)
    h = sb.submit(grid_prompt(53), seed=0)
    res = h.wait(timeout=120)
    sb.close()
    toks = res.tokens[9:]  # bucket-width prompt rows
    i = 0
    for _ in range(2):
        assert all(4 <= t <= 47 for t in toks[i : i + 2]), toks
        assert toks[i + 2] == 50
        i += 3
    assert toks[i] == 49


def test_streaming_batcher_seed_reproducible_across_interleavings():
    """submit(prompt, seed=s) yields bit-identical tokens under two
    different co-scheduling interleavings (VERDICT r3 #2): the engine
    carries per-slot rng streams seeded from each request's own seed at
    admission — fresh batch or mid-flight refill — so a request's
    trajectory is a function of (prompt, seed) alone, matching the
    reference's per-run generator (jacobi_iteration_lumina_mgpt.py:
    1021-1023) without giving up batching."""
    from sjd_tpu.core.serving import StreamingBatcher

    params = tiny_params()
    eng = grammar_engine()

    def run_interleaving(order):
        sb = StreamingBatcher(eng, params, batch=2, chunk_steps=4,
                              prompt_width=5)
        handles = {}
        for size_tok, seed in order:
            handles[(size_tok, seed)] = sb.submit(
                grid_prompt(size_tok), seed=seed)
        results = {k: h.wait(timeout=180) for k, h in handles.items()}
        sb.close()
        return {k: np.asarray(r.tokens) for k, r in results.items()}

    # interleaving A: the tracked requests arrive together
    a = run_interleaving([(54, 7), (53, 11), (54, 5), (53, 3)])
    # interleaving B: same (prompt, seed) requests in a different arrival
    # order, co-scheduled with different companions — some join a fresh
    # batch, some are admitted by refill
    b = run_interleaving([(53, 99), (54, 7), (53, 3), (54, 42), (53, 11)])
    for key in ((54, 7), (53, 11), (53, 3)):
        np.testing.assert_array_equal(a[key], b[key])


def test_continuous_batcher_per_prompt_seeds():
    """ContinuousBatcher.run(seeds=[...]): prompt i's output is a function
    of (prompts[i], seeds[i]) alone — identical across batch sizes (so a
    resumed or re-sharded benchmark run regenerates identical images)."""
    params = tiny_params()
    eng = grammar_engine()
    sizes = [53, 54, 53, 54, 53]
    prompts = np.asarray([grid_prompt(s) for s in sizes], np.int32)
    seeds = [11, 22, 33, 44, 55]

    batcher = ContinuousBatcher(eng, params, chunk_steps=8)
    got2 = batcher.run(jax.random.PRNGKey(0), prompts, batch=2, seeds=seeds)
    got3 = batcher.run(jax.random.PRNGKey(9), prompts, batch=3, seeds=seeds)
    for c2, c3 in zip(got2, got3):
        assert c2.prompt_index == c3.prompt_index
        np.testing.assert_array_equal(c2.tokens, c3.tokens)


def test_generate_per_slot_keys_match_single_key_split():
    """generate(rng=[B,2] keys) with keys == split(key, B) reproduces
    generate(rng=key) exactly — the [B,2] form is the same computation with
    the split done by the caller."""
    params = tiny_params()
    eng = grammar_engine()
    prompts = jnp.asarray([grid_prompt(53), grid_prompt(54)], jnp.int32)
    key = jax.random.PRNGKey(5)
    a = eng.generate(params, key, prompts)
    b = eng.generate(params, jax.random.split(key, 2), prompts)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(a.length), np.asarray(b.length))


def test_streaming_batcher_embedding_mode():
    """Embedding-mode StreamingBatcher (LlamaGen c2i serving): class-embed
    prompts submitted online; every completion is a full fixed-length image
    block and live slots are undisturbed by admissions."""
    from sjd_tpu.core import EngineConfig, GrammarSpec, SJDEngine
    from sjd_tpu.core.serving import StreamingBatcher
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
    model = decoder_model_fns(cfg, max_positions=64)
    eng = SJDEngine(
        model,
        EngineConfig(window=5, interval_r=block - 7, max_len=1 + block,
                     eos_id=-1, cfg_mode="neg_prompt"),
        LLAMAGEN_GRAMMAR,
        SamplingParams(do_cfg=True, guidance_scale=4.0, image_top_k=32,
                       text_top_k=32),
    )
    ne1 = embed_uncond_class(cond, 1, jnp.float32)[0]

    sb = StreamingBatcher(eng, params, batch=2, chunk_steps=4,
                          prompt_width=1, embed_dim=cfg.hidden_size)
    handles = []
    for label in (3, 7, 5, 2, 9):
        pe = embed_class(cond, jnp.asarray([label], jnp.int32),
                         jnp.float32)[0]
        handles.append(sb.submit(prompt_embeds=pe, neg_prompt_embeds=ne1,
                                 seed=label))
    results = [h.wait(timeout=180) for h in handles]
    sb.close()
    for res in results:
        assert res.gen_count >= block
        # all generated tokens are image-vocab ids under the llamagen grammar
        toks = res.tokens[1 : 1 + block]
        assert ((0 <= toks) & (toks < 32)).all()
