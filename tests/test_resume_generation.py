"""Chunked generation: generate(max_steps) + resume must reproduce the
single-shot trajectory exactly (greedy)."""

import jax
import jax.numpy as jnp
import numpy as np

from sjd_tpu.core import SamplingParams

from helpers import make_engine, tiny_params


def test_chunked_resume_matches_single_shot():
    params = tiny_params()
    eng = make_engine(
        window=5, scheme="jacobi", max_len=36,
        sampling=SamplingParams(do_cfg=False, greedy=True,
                                image_top_k=64, text_top_k=64),
    )
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    want = eng.generate(params, jax.random.PRNGKey(0), prompt)

    got, state = eng.generate(params, jax.random.PRNGKey(0), prompt,
                              max_steps=4, return_state=True)
    assert int(got.nfe) <= 4
    while not bool(jnp.all(state.finished)):
        got, state = eng.resume(params, state, max_steps=3, return_state=True)

    np.testing.assert_array_equal(
        np.asarray(got.tokens[0, : int(got.length[0])]),
        np.asarray(want.tokens[0, : int(want.length[0])]),
    )
    assert int(got.nfe) == int(want.nfe)
