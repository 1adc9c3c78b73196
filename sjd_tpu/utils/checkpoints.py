"""Checkpoint save/resume via orbax — the xllmx ckpt subsystem equivalent.

Reference behavior reproduced (xllmx/util/ckpt.py:46-146):
  * step-indexed checkpoint dirs with pruning to `max_keep`
  * consolidated model weights plus optimizer state (the reference writes
    rank-0 FULL_STATE_DICT + per-rank optimizer shards; orbax writes each
    shard from its owner and restores to any mesh layout)
  * resume restores params/optimizer/step (finetune.py:458-507)

Multi-host coordination (the reference's barriers, ckpt.py:122,145) is
handled inside orbax's atomic-commit protocol.
"""

from __future__ import annotations

from typing import Any, Optional

import orbax.checkpoint as ocp

PyTree = Any


def make_manager(directory: str, *, max_keep: int = 3) -> ocp.CheckpointManager:
    import os

    # orbax requires absolute paths; converting here means every caller is
    # safe (the abspath bandaid previously lived in examples/finetune.py)
    directory = os.path.abspath(directory)
    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_keep, create=True, enable_async_checkpointing=False
        ),
    )


def save(manager: ocp.CheckpointManager, step: int, state: PyTree) -> None:
    manager.save(step, args=ocp.args.StandardSave(state))
    manager.wait_until_finished()


def restore(
    manager: ocp.CheckpointManager,
    abstract_state: PyTree,
    step: Optional[int] = None,
) -> PyTree:
    step = manager.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError("no checkpoint to restore")
    return manager.restore(step, args=ocp.args.StandardRestore(abstract_state))
