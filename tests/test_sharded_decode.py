"""Multi-device SJD decoding: the engine's whole jitted while_loop under a
tensor-parallel mesh must reproduce single-device generation exactly —
SURVEY.md §2.10's TP strategy applied to inference, which the reference never
had (its multi-GPU inference is process-level prompt sharding only)."""

import jax
import jax.numpy as jnp
import numpy as np

from sjd_tpu.core import SamplingParams
from sjd_tpu.parallel import apply_named_sharding, decoder_param_specs, make_mesh

from helpers import TINY, make_engine, tiny_params


def test_tp_sharded_generate_matches_unsharded():
    params = tiny_params()
    eng = make_engine(
        window=5, scheme="jacobi", max_len=28,
        sampling=SamplingParams(do_cfg=False, greedy=True,
                                image_top_k=64, text_top_k=64),
    )
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    want = eng.generate(params, jax.random.PRNGKey(0), prompt)

    mesh = make_mesh(data=4, model=2)
    specs = decoder_param_specs(TINY, tp=True, fsdp=False)
    sharded = apply_named_sharding(mesh, params, specs)
    with jax.set_mesh(mesh):
        got = eng.generate(sharded, jax.random.PRNGKey(0), prompt)

    np.testing.assert_array_equal(
        np.asarray(got.tokens[0, : int(got.length[0])]),
        np.asarray(want.tokens[0, : int(want.length[0])]),
    )
    assert int(got.nfe) == int(want.nfe)


def test_data_parallel_batched_generate():
    """Prompt batch sharded over the 'data' axis — the TPU equivalent of the
    reference's per-GPU prompt fan-out, but inside one jit."""
    params = tiny_params()
    eng = make_engine(
        window=4, scheme="jacobi", max_len=20,
        sampling=SamplingParams(do_cfg=False, greedy=True,
                                image_top_k=64, text_top_k=64),
    )
    prompts = jnp.asarray([[1, 2, 3], [5, 6, 7], [2, 4, 6], [9, 8, 7]], jnp.int32)
    want = eng.generate(params, jax.random.PRNGKey(0), prompts)

    mesh = make_mesh(data=4, model=2)
    specs = decoder_param_specs(TINY, tp=True, fsdp=False)
    sharded = apply_named_sharding(mesh, params, specs)
    with jax.set_mesh(mesh):
        batch = jax.device_put(
            prompts, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        )
        got = eng.generate(sharded, jax.random.PRNGKey(0), batch)

    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(want.tokens))
