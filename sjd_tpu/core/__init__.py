from .acceptance import AcceptResult, jacobi_accept, speculative_accept
from .decomposer import DecomposeResult, sequential_decompose
from .drafts import Window, build_window
from .engine import EngineConfig, GenerateResult, ModelFns, SJDEngine
from .grammar import GrammarSpec, GrammarState, apply_grammar, init_state, update_state
from .processors import SamplingParams, process_window_logits
from .serving import CompletedGeneration, ContinuousBatcher

__all__ = [
    "AcceptResult",
    "jacobi_accept",
    "speculative_accept",
    "DecomposeResult",
    "sequential_decompose",
    "Window",
    "build_window",
    "EngineConfig",
    "GenerateResult",
    "ModelFns",
    "SJDEngine",
    "GrammarSpec",
    "GrammarState",
    "apply_grammar",
    "init_state",
    "update_state",
    "SamplingParams",
    "process_window_logits",
    "CompletedGeneration",
    "ContinuousBatcher",
]
