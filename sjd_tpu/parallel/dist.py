"""Multi-host initialization — the xllmx/util/dist.py equivalent.

The reference initializes torch.distributed with NCCL from torchrun env vars
or SLURM autodetection (:33-85) and offers all_reduce_mean (:88-99). On TPU:

  * `init_distributed()` wraps jax.distributed.initialize, reading the same
    env conventions (coordinator address / process count / id) with SLURM
    autodetection; on single-host TPU or CPU it is a no-op.
  * collectives are implicit in pjit shardings (XLA emits them over ICI/DCN);
    `all_reduce_mean` is provided for host-level scalars via
    multihost_utils, mirroring the reference's metric reduction.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def _first_slurm_node(nodelist: str) -> str:
    """First hostname of a SLURM nodelist, expanding the compressed bracket
    form: 'nid[001-004,007]' -> 'nid001' (zero padding preserved). The naive
    split-on-'[' yielded the bare prefix 'nid', an unresolvable coordinator
    host for every multi-node job."""
    import re

    m = re.match(r"([^\[,]+)\[([^\]]+)\]", nodelist)
    if m:
        prefix, ranges = m.groups()
        first = ranges.split(",")[0].split("-")[0]
        return prefix + first
    return nodelist.split(",")[0]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX. Resolution order mirrors the reference:
    explicit args > torchrun-style env (MASTER_ADDR/PORT, WORLD_SIZE, RANK) >
    SLURM autodetect > single-process fallback (dist.py:33-75)."""
    env = os.environ
    if coordinator_address is None and "MASTER_ADDR" in env:
        coordinator_address = f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '1234')}"
        num_processes = num_processes or int(env.get("WORLD_SIZE", "1"))
        process_id = process_id if process_id is not None else int(env.get("RANK", "0"))
    elif coordinator_address is None and "SLURM_JOB_NODELIST" in env:
        # first node of the SLURM allocation is the coordinator
        head = _first_slurm_node(env["SLURM_JOB_NODELIST"])
        coordinator_address = f"{head}:12345"
        num_processes = num_processes or int(env.get("SLURM_NTASKS", "1"))
        process_id = process_id if process_id is not None else int(
            env.get("SLURM_PROCID", "0")
        )

    if coordinator_address and (num_processes or 1) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_reduce_mean(x: float) -> float:
    """Mean of a host scalar across processes (dist.py:88-99). Under pjit,
    training metrics are already global; this covers host-side scalars."""
    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils
    import jax.numpy as jnp

    arr = multihost_utils.process_allgather(jnp.float32(x))
    return float(arr.mean())


def barrier(name: str = "barrier") -> None:
    """Cross-host sync (the reference's dist.barrier at checkpoint edges)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
