from .taming import (
    CHAMELEON_VQ,
    LLAMAGEN_VQ8,
    LLAMAGEN_VQ16,
    VQConfig,
    codebook_encode,
    codebook_lookup,
    decode,
    encode,
    init_vq_params,
)
from .port import port_vqgan

__all__ = [
    "CHAMELEON_VQ",
    "LLAMAGEN_VQ8",
    "LLAMAGEN_VQ16",
    "VQConfig",
    "codebook_encode",
    "codebook_lookup",
    "decode",
    "encode",
    "init_vq_params",
    "port_vqgan",
]
