"""Tests for the length-clustered sampler, finetune dataset, and loggers."""

import json

import numpy as np

from sjd_tpu.data.dataset import FinetuneDataset, pad_batch
from sjd_tpu.data.sampler import LengthClusteredSampler
from sjd_tpu.utils.logging import MetricLogger, SmoothedValue


def test_sampler_partitions_and_resumes():
    lengths = list(np.random.RandomState(0).randint(10, 100, 64))
    kw = dict(batch_size=4, num_replicas=2, grad_accum=1, bucket_size=16, seed=1)
    s0 = LengthClusteredSampler(lengths, rank=0, **kw)
    s1 = LengthClusteredSampler(lengths, rank=1, **kw)
    i0, i1 = list(s0), list(s1)
    assert not set(i0) & set(i1)  # disjoint across replicas
    assert len(i0) == len(i1) == len(s0)

    # same epoch -> same order; next epoch differs
    assert list(s0) == i0
    s0.set_epoch(1)
    assert list(s0) != i0

    # mid-epoch resume drops exactly start_iter batches
    s0.set_epoch(0, start_iter=3)
    resumed = list(s0)
    assert resumed == i0[3 * 4 :]


def test_sampler_length_clustering():
    lengths = list(range(1000, 0, -1))
    s = LengthClusteredSampler(lengths, batch_size=8, bucket_size=50, seed=0)
    idxs = list(s)
    # within a batch, lengths should be close (same bucket ordering)
    spans = []
    for b in range(0, len(idxs) - 8, 8):
        ls = [lengths[i] for i in idxs[b : b + 8]]
        spans.append(max(ls) - min(ls))
    assert np.median(spans) <= 50, np.median(spans)


def test_dataset_and_padding(tmp_path):
    recs = [
        {"input_ids": [1, 2, 3], "labels": [-100, 2, 3], "len": 3},
        {"input_ids": [4, 5], "labels": [4, 5], "len": 2},
    ]
    rec_path = tmp_path / "records.json"
    rec_path.write_text(json.dumps(recs))
    meta_path = tmp_path / "meta.json"
    meta_path.write_text(json.dumps([{"path": str(rec_path), "type": "t2i"}]))

    ds = FinetuneDataset(str(meta_path))
    assert len(ds) == 2
    assert ds.lengths() == [3, 2]
    item = ds[0]
    assert item["input_ids"] == [1, 2, 3]

    ids, labels, mask = pad_batch([ds[0], ds[1]], pad_id=0)
    assert ids.shape == (2, 3)
    assert labels[1, 2] == -100 and not mask[1, 2]


def test_metric_logger():
    m = MetricLogger()
    for v in range(10):
        m.update(loss=float(v))
    assert "loss" in str(m)
    sv = SmoothedValue(window_size=4)
    for v in [1, 2, 3, 4, 100]:
        sv.update(v)
    assert sv.median <= 4 and sv.global_avg > 4
