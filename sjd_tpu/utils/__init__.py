from .port import (
    load_torch_checkpoint,
    port_hf_llama_like,
    port_llamagen,
    state_dict_to_numpy,
)

__all__ = [
    "load_torch_checkpoint",
    "port_hf_llama_like",
    "port_llamagen",
    "state_dict_to_numpy",
]
