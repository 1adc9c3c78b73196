"""Device mesh construction.

The reference's distributed runtime is NCCL process groups + FSDP wrappers
(xllmx/util/dist.py:33-85, xllmx/solvers/finetune/finetune.py:375-417). The
TPU-native equivalent is a single `jax.sharding.Mesh` over all devices with
named axes:

  'data'  — batch / FSDP parameter sharding (maps to the reference's
            FULL_SHARD data-parallel group)
  'model' — tensor parallelism over attention heads / MLP hidden
            (the reference's vestigial `model_parallel_size`,
            configuration_chameleon.py:212, realized here)

XLA inserts the collectives (all-gather for FSDP params, psum for TP
reductions and gradient sync) from sharding annotations; they ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def host_local_mesh(model: int = 1) -> Mesh:
    """Mesh over this host's addressable devices only — the TPU equivalent of
    the reference's no-communication multi-host inference fan-out
    (dataset_tools/multi_gpu_infer_with_prompt.py:146-172)."""
    return make_mesh(model=model, devices=jax.local_devices())


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)
