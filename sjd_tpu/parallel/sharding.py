"""Sharding rules for the decoder parameter pytree.

Megatron-style tensor parallelism falls out of the stacked-layer layout:

  wq/wk/wv  [L, H*Dh, d]  -> shard heads (out dim) on 'model'
  wo        [L, d, H*Dh]  -> shard the contracting dim on 'model' (psum)
  w_gate/up [L, ff, d]    -> shard ff (out dim) on 'model'
  w_down    [L, d, ff]    -> shard the contracting dim on 'model' (psum)
  (weights are torch-layout [out, in], models/transformer.py:init_params)
  qk-norm   [L, H, Dh]     -> per-head params shard with heads — exactly the
                              sharding the reference's ChameleonLayerNorm
                              repeat trick implies (modeling_chameleon.py:206-221)
  embed / lm_head          -> shard vocab on 'model'

FSDP ("data"-axis parameter sharding, the reference's FULL_SHARD) shards the
layer-stack leading dim; with both enabled each parameter is a 2-D tile of
(layers x heads). Activations stay batch-sharded on 'data'.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.transformer import DecoderConfig

PyTree = Any


def decoder_param_specs(
    cfg: DecoderConfig, *, tp: bool = True, fsdp: bool = False,
    data_size: int = 0,
) -> Dict:
    m = "model" if tp else None
    layers = {
        "attn_norm": P(None, None),
        "wq": P(None, m, None),
        "wk": P(None, m, None),
        "wv": P(None, m, None),
        "wo": P(None, None, m),
        "mlp_norm": P(None, None),
        "w_gate": P(None, m, None),
        "w_up": P(None, m, None),
        "w_down": P(None, None, m),
    }
    if cfg.qk_norm:
        layers["q_norm_scale"] = P(None, m, None)
        layers["q_norm_bias"] = P(None, m, None)
        layers["k_norm_scale"] = P(None, m, None)
        layers["k_norm_bias"] = P(None, m, None)
    specs = {
        "embed": P(m, None),
        "layers": layers,
        "final_norm": P(None),
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(m, None)
    if fsdp:
        shapes = _decoder_param_shapes(cfg)
        specs = add_fsdp_axis(shapes, specs, data_size)
    return specs


def _decoder_param_shapes(cfg: DecoderConfig) -> Dict:
    from ..models.transformer import init_params

    return jax.eval_shape(lambda: init_params(jax.random.PRNGKey(0), cfg))


def add_fsdp_axis(shapes: PyTree, specs: PyTree, data_size: int) -> PyTree:
    """Add 'data' sharding to the largest divisible unsharded dim of each
    leaf — parameter-shard everything the way FSDP FULL_SHARD does
    (finetune.py:383-414), but respecting the TP axes already assigned and
    each leaf's actual divisibility."""
    assert data_size > 0, "fsdp specs need data_size (the 'data' axis length)"

    def per_leaf(shape_leaf, spec: P) -> P:
        shape = shape_leaf.shape
        parts = list(spec) + [None] * (len(shape) - len(spec))
        best, best_dim = 0, None
        for d, size in enumerate(shape):
            if parts[d] is None and size % data_size == 0 and size > best:
                best, best_dim = size, d
        if best_dim is not None:
            parts[best_dim] = "data"
        return P(*parts)

    return jax.tree_util.tree_map(per_leaf, shapes, specs)


def batch_specs() -> P:
    return P("data")


def apply_named_sharding(mesh: Mesh, params: PyTree, specs: PyTree) -> PyTree:
    """Device-put a pytree with per-leaf PartitionSpecs."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def kv_cache_specs(*, tp: bool = True) -> P:
    """KV buffers [S, layers, L, Hkv, D]: batch on 'data', kv heads on 'model'."""
    return P("data", None, None, "model" if tp else None, None)


def expand_specs_for_quantized(params: PyTree, specs: PyTree) -> PyTree:
    """Match name->PartitionSpec trees to quantized param pytrees.

    quantize_weights replaces projection leaves with dicts ({"q": int8 or
    "q4p": packed uint8, "s": scales}); the plain specs from
    decoder_param_specs then structurally mismatch. This expands each spec P
    over a quantized leaf-dict: the values array keeps the weight's spec
    (the packed int4 K/2 axis has the same logical axis order), and the
    scale vector keeps the spec's leading axes (per-out-channel scales drop
    the contracted dim). Under GSPMD the int4 unpack is an op on the LOGICAL
    array, so sharding the packed axis stays semantically exact.
    """

    def is_qdict(t):
        return isinstance(t, dict) and ("q" in t or "q4p" in t)

    def expand(param_leaf, spec):
        if not is_qdict(param_leaf):
            return spec
        val_key = "q" if "q" in param_leaf else "q4p"
        s_ndim = param_leaf["s"].ndim
        return {val_key: spec, "s": P(*tuple(spec)[:s_ndim])}

    return jax.tree_util.tree_map(
        expand, params, specs, is_leaf=is_qdict
    )
