"""Emu3 grammar parity: this repo's positional constraint must allow exactly
the token sets of the reference Emu3PrefixConstrainedLogitsHelper
(emu3/mllm/utils_emu3.py:19-62) at every generated offset."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from emu3.mllm.utils_emu3 import Emu3PrefixConstrainedLogitsHelper  # noqa: E402

from sjd_tpu.core import grammar as G  # noqa: E402

V = 128
H_LAT, W_LAT = 3, 4
IMG, EOI, EOS, EOL, EOF, PAD = 100, 101, 102, 103, 104, 105
VIS = list(range(4, 48))

SPEC = G.GrammarSpec(
    kind="emu3",
    image_start_id=99,
    image_end_id=EOI,
    newline_id=EOL,
    eof_id=EOF,
    eos_id=EOS,
    pad_id=PAD,
    image_vocab_start=VIS[0],
    image_vocab_end=VIS[-1],
)


def test_offsets_match_reference_helper():
    helper = Emu3PrefixConstrainedLogitsHelper(
        height=torch.tensor([H_LAT]), width=torch.tensor([W_LAT]),
        img_token=IMG, eoi_token=EOI, eos_token=EOS, eol_token=EOL,
        eof_token=EOF, pad_token=PAD, visual_tokens=VIS,
    )
    prompt = [1, 2, IMG]  # reference offsets count from the <image token>

    total = (W_LAT + 1) * H_LAT + 6
    for n_gen in range(0, total):
        # reference: allowed set for the NEXT position given ids so far
        ids = torch.tensor(prompt + VIS[:1] * n_gen)  # values past IMG don't matter
        allowed_ref = set(int(t) for t in helper(0, ids))

        # this repo: grammar row 0 of a window at img_count = n_gen
        st = G.GrammarState(
            in_image=jnp.asarray([True]),
            size_known=jnp.asarray([True]),
            h_lat=jnp.asarray([H_LAT], jnp.int32),
            w_lat=jnp.asarray([W_LAT], jnp.int32),
            img_count=jnp.asarray([n_gen], jnp.int32),
            header_seen=jnp.asarray([2], jnp.int32),
        )
        scores = G.apply_grammar(SPEC, st, jnp.zeros((1, 1, V)))
        allowed_mine = set(np.nonzero(np.asarray(scores[0, 0]) > -1e30)[0].tolist())

        assert allowed_mine == allowed_ref, (n_gen, sorted(allowed_mine)[:5],
                                             sorted(allowed_ref)[:5])
