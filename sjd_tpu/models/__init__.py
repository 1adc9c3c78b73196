from .transformer import (
    DecoderConfig,
    KVCache,
    forward,
    forward_train,
    init_kv_cache,
    init_params,
    make_rope_table,
)
from .adapter import decoder_model_fns

__all__ = [
    "DecoderConfig",
    "KVCache",
    "forward",
    "forward_train",
    "init_kv_cache",
    "init_params",
    "make_rope_table",
    "decoder_model_fns",
]

from . import anole, chameleon, emu3, llamagen  # model families

__all__ += ["anole", "chameleon", "emu3", "llamagen"]
