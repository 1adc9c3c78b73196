"""Anole multimodal_generation_mode parity against the reference's 3-dim
processor stacks (scheduler/jacobi_iteration_anhole.py:170-262, processors at
scheduler/logit_processor_3dim.py:207-353), imported read-only as oracles.

The reference's window ports key every positional check on the *committed*
ids (input_ids.shape[1] / input_ids[..., -offset]), i.e. on row 0's view of
the window; this repo's grammar is per-row positional. The oracle comparisons
therefore run on W=1 windows — where both formulations must agree bit-exactly
for every phase of an image — plus window-shape tests for the
position-independent suppress stacks.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import transformers.generation.logits_process as _lp  # noqa: E402

if not hasattr(_lp, "LogitsWarper"):
    _lp.LogitsWarper = _lp.LogitsProcessor

from sjd_tpu.core import grammar as G  # noqa: E402
from sjd_tpu.models.anole import anole_grammar  # noqa: E402

V = 120
BOI, EOI, EOS = 101, 100, 2
IMG_LO, IMG_HI = 4, 99
L_IMG = 8  # tiny image_seq_length
MAXLEN = 64


def _spec(mode, max_len=MAXLEN):
    import dataclasses

    s = anole_grammar(mode, max_len=max_len)
    return dataclasses.replace(
        s, image_start_id=BOI, image_end_id=EOI, eos_id=EOS,
        image_vocab_start=IMG_LO, image_vocab_end=IMG_HI,
        image_seq_length=L_IMG,
        boi_suppress_from=(
            max_len - L_IMG - 1 if mode in ("image-only", "interleaved") else -1
        ),
    )


def _state(in_image, img_count):
    return G.GrammarState(
        in_image=jnp.asarray([in_image]),
        size_known=jnp.asarray([True]),
        h_lat=jnp.zeros((1,), jnp.int32),
        w_lat=jnp.zeros((1,), jnp.int32),
        img_count=jnp.asarray([img_count], jnp.int32),
        header_seen=jnp.asarray([2], jnp.int32),
    )


def _ref_stack(mode):
    from scheduler.logit_processor_3dim import (
        AllowOnlyTokensAtRelativeOffsetLogitsProcessor3d,
        AllowOnlyTokensInRelativeWindowLogitsProcessor3d,
        SuppressTokensAtBeginLogitsProcessor3d,
        SuppressTokensInIndexRangeLogitsProcessor3d,
        SuppressTokensLogitsProcessor3d,
    )

    image_ids = list(range(IMG_LO, IMG_HI + 1))
    if mode == "text-only":
        return [SuppressTokensLogitsProcessor3d(image_ids + [BOI, EOI])]
    stack = [
        AllowOnlyTokensAtRelativeOffsetLogitsProcessor3d(
            trigger_token_id=BOI, allowed_token_ids=[EOI],
            offset=L_IMG + 1, exclusive=True,
        ),
        AllowOnlyTokensInRelativeWindowLogitsProcessor3d(
            trigger_token_id=BOI, allowed_token_ids=image_ids,
            window_width=L_IMG, exclusive=True,
        ),
        SuppressTokensInIndexRangeLogitsProcessor3d(
            suppress_tokens=[BOI], start_index=MAXLEN - L_IMG - 1,
        ),
    ]
    if mode == "image-only":
        allowed = set(image_ids) | {EOS, BOI, EOI}
        stack.append(
            SuppressTokensLogitsProcessor3d(
                [t for t in range(V) if t not in allowed]
            )
        )
        # begin index set per-test (prompt length)
    return stack


def _run_ref(stack, ids, scores):
    t_ids = torch.tensor([ids], dtype=torch.long)
    out = torch.tensor(scores[None, None])  # [1, 1, V]
    for p in stack:
        out = p(t_ids, out)
    return out[0, 0].numpy()


def _mask(x):
    return x <= torch.finfo(torch.float32).min + 1e30


def _committed(phase):
    """Committed ids for a given number of image tokens already emitted;
    None = not inside an image."""
    prompt = [7, 8, 9]
    if phase is None:
        return prompt, _state(False, 0)
    return prompt + [BOI] + list(range(IMG_LO, IMG_LO + phase)), _state(True, phase)


@pytest.mark.parametrize("mode", ["text-only", "image-only", "interleaved"])
@pytest.mark.parametrize("phase", [None, 0, 3, L_IMG - 1, L_IMG])
def test_mode_masks_match_reference(mode, phase):
    rs = np.random.RandomState(hash((mode, phase)) % 2**31)
    scores = rs.randn(V).astype(np.float32)

    ids, state = _committed(phase)
    spec = _spec(mode)

    stack = _ref_stack(mode)
    if mode == "image-only":
        from scheduler.logit_processor_3dim import (
            SuppressTokensAtBeginLogitsProcessor3d,
        )

        # begin index = prompt length incl. appended <boi> = 4
        stack.append(SuppressTokensAtBeginLogitsProcessor3d([EOS], 4))

    ref = _run_ref(stack, ids, scores.copy())

    pred_pos = jnp.asarray([[len(ids)]], jnp.int32)
    begin = jnp.asarray([4], jnp.int32)
    got = np.asarray(
        G.apply_grammar(
            spec, state, jnp.asarray(scores[None, None]),
            pred_pos=pred_pos, begin_pos=begin,
        )[0, 0]
    )

    ref_banned = ref <= np.finfo(np.float32).min / 2
    got_banned = got <= np.finfo(np.float32).min / 2
    np.testing.assert_array_equal(got_banned, ref_banned)
    # surviving scores unchanged
    np.testing.assert_allclose(got[~got_banned], scores[~ref_banned])


def test_boi_room_check_matches_reference():
    """<boi> suppressed once the prediction position can no longer fit a
    whole image before max_length."""
    from scheduler.logit_processor_3dim import (
        SuppressTokensInIndexRangeLogitsProcessor3d,
    )

    spec = _spec("interleaved")
    rs = np.random.RandomState(0)
    scores = rs.randn(V).astype(np.float32)
    # our boi_suppress_from is a GENERATED offset (engine max_len excludes
    # the prompt); the reference's absolute start_index = prompt_len + that
    proc = SuppressTokensInIndexRangeLogitsProcessor3d(
        suppress_tokens=[BOI], start_index=3 + MAXLEN - L_IMG - 1
    )
    for cur_len in [10, MAXLEN - L_IMG - 2, MAXLEN - L_IMG - 1, MAXLEN - 2]:
        ids = list(range(3, 3 + cur_len))
        ref = _run_ref([proc], ids, scores.copy())
        got = np.asarray(
            G.apply_grammar(
                spec, _state(False, 0), jnp.asarray(scores[None, None]),
                pred_pos=jnp.asarray([[cur_len]], jnp.int32),
                begin_pos=jnp.asarray([3], jnp.int32),
            )[0, 0]
        )
        assert (got[BOI] <= np.finfo(np.float32).min / 2) == (
            ref[BOI] <= np.finfo(np.float32).min / 2
        ), cur_len


def test_text_only_window_shape():
    """text-only suppression is position-independent: whole [B, W, V]
    windows must match the reference processor output."""
    from scheduler.logit_processor_3dim import SuppressTokensLogitsProcessor3d

    rs = np.random.RandomState(1)
    W = 5
    scores = rs.randn(1, W, V).astype(np.float32)
    ids = [7, 8, 9]
    proc = SuppressTokensLogitsProcessor3d(
        list(range(IMG_LO, IMG_HI + 1)) + [BOI, EOI]
    )
    ref = proc(torch.tensor([ids]), torch.tensor(scores.copy())).numpy()
    got = np.asarray(
        G.apply_grammar(_spec("text-only"), _state(False, 0), jnp.asarray(scores))
    )
    np.testing.assert_array_equal(
        got <= np.finfo(np.float32).min / 2, ref <= np.finfo(np.float32).min / 2
    )


def test_unrestricted_is_identity():
    rs = np.random.RandomState(2)
    scores = rs.randn(1, 4, V).astype(np.float32)
    got = np.asarray(
        G.apply_grammar(_spec("unrestricted"), _state(True, 3), jnp.asarray(scores))
    )
    np.testing.assert_array_equal(got, scores)


def test_modes_end_to_end_tiny_engine():
    """Drive the engine with each mode on a tiny decoder: text-only emits no
    image machinery; image-only emits exactly <boi> + L image tokens + <eoi>."""
    import dataclasses

    import jax

    sys.path.insert(0, "tests")
    from helpers import make_engine, tiny_params

    L = 6
    base = anole_grammar("image-only", max_len=40)
    tiny = dataclasses.replace(
        base, image_start_id=48, image_end_id=49, eos_id=2,
        image_vocab_start=4, image_vocab_end=47, image_seq_length=L,
        boi_suppress_from=40 - L - 1,
    )
    params = tiny_params()

    # image-only: prompt ends with <boi>; generation = L image tokens + <eoi>
    eng = make_engine(window=4, max_len=40, grammar=tiny, interval_r=L + 1)
    import jax.numpy as jnp

    res = eng.generate(params, jax.random.PRNGKey(0),
                       jnp.asarray([[9, 11, 48]], jnp.int32))
    gen = [int(v) for v in res.tokens[0, 3 : int(res.length[0])]]
    assert all(4 <= t <= 47 for t in gen[:L]), gen
    assert gen[L] == 49, gen
    # image-only global allowlist: every generated token is image machinery
    # ({eos, boi, eoi} or image vocab) — never text
    for t in gen[L + 1 :]:
        assert t in (2, 48, 49) or 4 <= t <= 47, gen

    # text-only: no image vocab, no boi/eoi anywhere
    tiny_text = dataclasses.replace(tiny, mode="text-only",
                                    suppress_eos_at_begin=False,
                                    boi_suppress_from=-1)
    eng2 = make_engine(window=4, max_len=24, grammar=tiny_text)
    res2 = eng2.generate(params, jax.random.PRNGKey(1),
                         jnp.asarray([[9, 11, 13]], jnp.int32))
    gen2 = [int(v) for v in res2.tokens[0, 3 : int(res2.length[0])]]
    assert all(not (4 <= t <= 49) for t in gen2), gen2
