"""Length-clustered distributed batch sampler — xllmx FinetuneDistSampler.

Reproduces xllmx/data/sampler.py:50-214 semantics for TPU hosts:
  * group items by dataset `type` with optional per-group sampling ratios;
  * sort by item length and shuffle within fixed-size buckets so batches are
    length-homogeneous (less padding) but not deterministic;
  * emit global batches aligned to (num_replicas x batch_size x grad_accum)
    so every replica sees grad-accum-coherent slices;
  * `set_epoch(epoch, start_iter)` resumes mid-epoch by skipping consumed
    batches.
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence


class LengthClusteredSampler:
    def __init__(
        self,
        lengths: Sequence[int],
        *,
        batch_size: int,
        num_replicas: int = 1,
        rank: int = 0,
        grad_accum: int = 1,
        bucket_size: int = 500,
        seed: int = 0,
        groups: Optional[Sequence[str]] = None,
        group_ratios: Optional[Dict[str, float]] = None,
    ):
        assert 0 <= rank < num_replicas
        self.lengths = list(lengths)
        self.batch_size = batch_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.grad_accum = grad_accum
        self.bucket_size = bucket_size
        self.seed = seed
        self.groups = list(groups) if groups is not None else None
        self.group_ratios = group_ratios or {}
        self.epoch = 0
        self.start_iter = 0

    def set_epoch(self, epoch: int, start_iter: int = 0) -> None:
        self.epoch = epoch
        self.start_iter = start_iter

    def _indices_for_epoch(self) -> List[int]:
        rng = random.Random(self.seed + self.epoch)
        by_group: Dict[str, List[int]] = {}
        for i in range(len(self.lengths)):
            g = self.groups[i] if self.groups else "default"
            by_group.setdefault(g, []).append(i)

        selected: List[int] = []
        for g, idxs in by_group.items():
            ratio = self.group_ratios.get(g, 1.0)
            if ratio < 1.0:
                idxs = rng.sample(idxs, max(1, int(len(idxs) * ratio)))
            elif ratio > 1.0:
                whole = int(ratio)
                frac = ratio - whole
                idxs = idxs * whole + rng.sample(idxs, int(len(idxs) * frac))
            selected.extend(idxs)

        # sort by length, then shuffle within buckets
        selected.sort(key=lambda i: self.lengths[i])
        bucketed: List[int] = []
        for s in range(0, len(selected), self.bucket_size):
            bucket = selected[s : s + self.bucket_size]
            rng.shuffle(bucket)
            bucketed.extend(bucket)

        # global batches of (replicas * batch * accum), shuffled as units
        unit = self.num_replicas * self.batch_size * self.grad_accum
        n_units = len(bucketed) // unit
        units = [bucketed[u * unit : (u + 1) * unit] for u in range(n_units)]
        rng.shuffle(units)
        return [i for u in units for i in u]

    def __iter__(self):
        flat = self._indices_for_epoch()
        unit = self.num_replicas * self.batch_size * self.grad_accum
        per_rank = self.batch_size * self.grad_accum
        out: List[int] = []
        for u in range(len(flat) // unit):
            block = flat[u * unit : (u + 1) * unit]
            mine = block[self.rank * per_rank : (self.rank + 1) * per_rank]
            out.extend(mine)
        # resume: skip consumed OPTIMIZER iterations — each consumes a full
        # grad-accum unit of batch_size * grad_accum items per rank (skipping
        # only batch_size replayed most of the consumed data and left every
        # later accumulation window straddling two original units)
        return iter(out[self.start_iter * per_rank:])

    def __len__(self) -> int:
        # must agree with what __iter__ yields, INCLUDING the group-ratio
        # up/down-sampling (ratios change the epoch's index count)
        unit = self.num_replicas * self.batch_size * self.grad_accum
        if self.group_ratios:
            flat_len = (len(self._indices_for_epoch()) // unit) * unit
        else:
            flat_len = (len(self.lengths) // unit) * unit
        return flat_len // self.num_replicas
