"""Fine-tuning dataset over pre-tokenized record JSONs — xllmx equivalents.

Reproduces xllmx/data/dataset.py (191 LoC) behavior:
  * YAML/JSON meta listing record files with optional per-meta `type` and
    sampling `ratio` (consumed by data/sampler.py);
  * retry-on-error __getitem__ substituting a random item (:176-191);
  * cached token/label loading from the pre_tokenize output layout
    (lumina_mgpt/pre_tokenize/: one pickle/npz per item + a record JSON).
"""

from __future__ import annotations

import json
import pickle
import random
import time
from typing import Any, Dict, List, Optional


def load_meta(path: str) -> List[Dict[str, Any]]:
    """Meta file: [{"path": record.json, "type": "t2i", "ratio": 1.0}, ...]
    (YAML in the reference; JSON here with YAML accepted if available)."""
    text = open(path).read()
    try:
        metas = json.loads(text)
    except json.JSONDecodeError:
        import yaml  # type: ignore

        metas = yaml.safe_load(text)
    if isinstance(metas, dict):
        metas = metas.get("META", metas.get("meta", []))
    return metas


class FinetuneDataset:
    """Items are dicts with at least {"input_ids": [...], "labels": [...]}.

    Records may inline the tokens ("input_ids") or point at a pickle file
    ("file"/"token_file") produced by a pre-tokenization pass.
    """

    def __init__(self, meta_path: str, *, max_retries: int = 5):
        self.records: List[Dict[str, Any]] = []
        self.types: List[str] = []
        self.ratios: Dict[str, float] = {}
        for meta in load_meta(meta_path):
            rtype = meta.get("type", "default")
            if "ratio" in meta:
                self.ratios[rtype] = float(meta["ratio"])
            with open(meta["path"]) as f:
                recs = json.load(f)
            for r in recs:
                self.records.append(r)
                self.types.append(rtype)
        self.max_retries = max_retries

    def __len__(self) -> int:
        return len(self.records)

    def lengths(self) -> List[int]:
        out = [
            int(r.get("len", len(r.get("input_ids", [])) or 1)) for r in self.records
        ]
        # pre_tokenize.py always writes "len"; a meta without it degrades
        # every record to length 1 and silently defeats length clustering
        n_fallback = sum(
            1 for r in self.records
            if "len" not in r and "input_ids" not in r
        )
        if n_fallback:
            import warnings

            warnings.warn(
                f"{n_fallback}/{len(out)} records lack a 'len' field; "
                "length clustering will treat them as length 1"
            )
        return out

    def _load(self, idx: int) -> Dict[str, Any]:
        rec = self.records[idx]
        if "input_ids" in rec:
            return {"input_ids": rec["input_ids"], "labels": rec.get("labels", rec["input_ids"])}
        path = rec.get("file") or rec.get("token_file")
        with open(path, "rb") as f:
            blob = pickle.load(f)
        return {"input_ids": blob["input_ids"], "labels": blob.get("labels", blob["input_ids"])}

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        # retry with random substitutes on error (xllmx/data/dataset.py:176-191)
        for attempt in range(self.max_retries):
            try:
                return self._load(idx)
            except Exception:
                time.sleep(0.1)
                idx = random.randrange(len(self.records))
        raise RuntimeError(f"failed to load any item after {self.max_retries} retries")


def pad_batch(items: List[Dict[str, Any]], pad_id: int = 0, max_len: Optional[int] = None):
    """Right-pad a list of items to a rectangular batch with -100 labels on
    padding (ChameleonXLLMXForConditionalGeneration padding,
    modeling_xllmx_chameleon.py:20-33)."""
    import numpy as np

    L = max_len or max(len(it["input_ids"]) for it in items)
    B = len(items)
    ids = np.full((B, L), pad_id, np.int32)
    labels = np.full((B, L), -100, np.int32)
    mask = np.zeros((B, L), bool)
    for b, it in enumerate(items):
        n = min(len(it["input_ids"]), L)
        ids[b, :n] = it["input_ids"][:n]
        labels[b, :n] = it["labels"][:n]
        mask[b, :n] = True
    return ids, labels, mask
