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
from .discriminator import (
    PatchGANConfig,
    init_patchgan_params,
    patchgan_logits,
)
from .lpips import init_lpips_params, lpips, port_lpips
from .port import port_vqgan

__all__ = [
    "PatchGANConfig",
    "init_patchgan_params",
    "patchgan_logits",
    "init_lpips_params",
    "lpips",
    "port_lpips",
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
