from .datasets import PromptRecord, create_dataset, shard_prompts
from .harness import run_prompt_set, workdir_name
from .metrics import (
    clip_score,
    evaluate_quantitative_scores,
    frechet_distance,
    inception_score,
)

__all__ = [
    "PromptRecord",
    "create_dataset",
    "shard_prompts",
    "run_prompt_set",
    "workdir_name",
    "clip_score",
    "evaluate_quantitative_scores",
    "frechet_distance",
    "inception_score",
]
