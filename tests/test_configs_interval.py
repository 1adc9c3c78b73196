"""34B-config shape validation (abstract eval, no memory) and the
jacobi_loop_interval semantics (multi-token inside, 1-token AR outside —
reference jacobi_iteration_lumina_mgpt.py:1025, :1142-1144)."""

import jax
import jax.numpy as jnp
import numpy as np

from sjd_tpu.core import SamplingParams
from sjd_tpu.models import init_params, make_rope_table
from sjd_tpu.models.chameleon import chameleon_config
from sjd_tpu.models.emu3 import emu3_config
from sjd_tpu.models.transformer import forward, init_kv_cache

from helpers import make_engine, tiny_params


def _abstract_forward_shapes(cfg, T=4, L=32):
    """Trace the cached forward with abstract params — validates every shape
    in the architecture without allocating the model."""
    rope = jax.eval_shape(lambda: make_rope_table(cfg, 64))

    def fn(params):
        kv = init_kv_cache(cfg, 2, L)
        ids = jnp.zeros((2, T), jnp.int32)
        pos = jnp.zeros((2, T), jnp.int32)
        valid = jnp.ones((2, L), bool)
        rope_t = jnp.zeros((64, 2, cfg.head_dim), jnp.float32)
        out = forward(params, cfg, ids, pos, kv, jnp.zeros((2,), jnp.int32),
                      valid, rope_t)
        return out.logits

    abstract_params = jax.eval_shape(lambda: init_params(jax.random.PRNGKey(0), cfg))
    logits = jax.eval_shape(fn, abstract_params)
    return logits.shape


def test_chameleon_34b_shapes_trace():
    cfg = chameleon_config("34B")
    assert cfg.swin_norm and cfg.num_heads == 64 and cfg.num_kv_heads == 8
    assert _abstract_forward_shapes(cfg) == (2, 4, 65536)


def test_emu3_8b_shapes_trace():
    cfg = emu3_config()
    assert _abstract_forward_shapes(cfg) == (2, 4, 184622)


def test_interval_reverts_to_ar():
    """Beyond prompt_len + interval_r the loop must take 1-token steps:
    NFE for the tail equals the tail length."""
    params = tiny_params()
    # interval_r = 6: multi-token for the first 6 generated tokens only
    eng = make_engine(
        window=5, scheme="jacobi", max_len=30, interval_r=6,
        sampling=SamplingParams(do_cfg=False, greedy=True,
                                image_top_k=64, text_top_k=64),
    )
    res = eng.generate(params, jax.random.PRNGKey(0),
                       jnp.asarray([[1, 2, 3]], jnp.int32))
    gen = int(res.gen_count[0])
    nfe = int(res.nfe)
    multi = int(res.steps_multi)
    # tail of (gen - 6) tokens decoded one per forward; the first 6 took
    # at least 1 forward (prefill) and at most 6
    tail = gen - 6
    assert nfe >= tail + 1, (nfe, gen)
    assert nfe <= tail + 7, (nfe, gen)
    # multi-token steps happened only inside the interval
    assert 1 <= multi <= 6, multi
