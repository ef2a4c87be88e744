"""Checkpoint save/restore via orbax (SURVEY.md C21/§5: torch.save → orbax).

Saves (params, batch_stats, opt_state, step, rng) with async-capable
orbax CheckpointManager; resume restores onto the current sharding.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .loop import TrainState


def make_manager(directory: str, keep: int = 3) -> ocp.CheckpointManager:
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    return ocp.CheckpointManager(directory, options=options)


def save(manager: ocp.CheckpointManager, state: TrainState) -> None:
    step = int(jax.device_get(state.step))
    manager.save(step, args=ocp.args.StandardSave(state))


def restore(
    manager: ocp.CheckpointManager,
    template: TrainState,
    step: Optional[int] = None,
) -> Optional[TrainState]:
    """Restore latest (or given) step onto ``template``'s structure/sharding.

    Returns None if no checkpoint exists.
    """
    step = step if step is not None else manager.latest_step()
    if step is None:
        return None
    return manager.restore(step, args=ocp.args.StandardRestore(template))
