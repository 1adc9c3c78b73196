"""Benchmark prompt datasets + static multi-host sharding (layer L6).

Re-implements dataset_tools/dataset_templates.py:28-216 and
multi_gpu_dataframe_split.py:11-93: PartiPrompts TSV and MS-COCO captions
(longest caption per image), split contiguously by (node, worker) with no
communication — restartable, filesystem-only coordination, exactly the
reference's multi-node scheme (eval_model.py:35-56).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Sequence


@dataclass
class PromptRecord:
    index: int  # global index (names the output file)
    prompt: str
    negative_prompt: str = ""


def load_parti_prompts(tsv_path: str, prompt_column: str = "Prompt") -> List[PromptRecord]:
    import pandas as pd

    df = pd.read_csv(tsv_path, sep="\t")
    return [
        PromptRecord(index=i, prompt=str(p))
        for i, p in enumerate(df[prompt_column].tolist())
    ]


def load_coco_captions(annotation_json: str) -> List[PromptRecord]:
    """captions_val*.json: keep the longest caption per image
    (MSCOCOPromptBench, dataset_templates.py:117-216)."""
    with open(annotation_json) as f:
        ann = json.load(f)
    per_image = {}
    for a in ann["annotations"]:
        cap = a["caption"].strip()
        img = a["image_id"]
        if img not in per_image or len(cap) > len(per_image[img]):
            per_image[img] = cap
    items = sorted(per_image.items())
    return [PromptRecord(index=i, prompt=c) for i, (_, c) in enumerate(items)]


def create_dataset(name: str, path: str) -> List[PromptRecord]:
    if "parti" in name.lower():
        return load_parti_prompts(path)
    if "coco" in name.lower():
        return load_coco_captions(path)
    raise ValueError(f"unknown dataset {name!r}")


def shard_prompts(
    records: Sequence[PromptRecord],
    *,
    node_id: int = 0,
    num_nodes: int = 1,
    worker_id: int = 0,
    num_workers: int = 1,
) -> List[PromptRecord]:
    """Contiguous split by node then worker, preserving global indices
    (split_dataframe_for_gpu, multi_gpu_dataframe_split.py:11-63)."""

    def split(seq, k, n):
        per = (len(seq) + n - 1) // n
        return list(seq[k * per : (k + 1) * per])

    return split(split(list(records), node_id, num_nodes), worker_id, num_workers)
