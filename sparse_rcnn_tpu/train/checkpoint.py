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


def best_dir(checkpoint_dir: str) -> str:
    """The sibling directory where train.py retains the best-mid-run-mAP
    weights (one naming convention for train.py / eval.py / infer.py)."""
    return checkpoint_dir.rstrip("/") + "_best"


def read_best_score(checkpoint_dir: str) -> float:
    """Best mAP recorded in the _best sidecar (-inf if none) — seeds the
    best tracker across --resume so a worse post-resume eval can't
    overwrite the retained best weights."""
    import json

    path = os.path.join(os.path.abspath(best_dir(checkpoint_dir)), "best.json")
    try:
        with open(path) as f:
            return float(json.load(f)["score"])
    except (OSError, ValueError, KeyError):
        return float("-inf")


def write_best_score(checkpoint_dir: str, score: float, step: int) -> None:
    import json

    path = os.path.join(os.path.abspath(best_dir(checkpoint_dir)), "best.json")
    with open(path, "w") as f:
        json.dump({"score": float(score), "step": int(step)}, f)


def _as_tree(state: TrainState) -> dict:
    """TrainState → plain dict of its non-None fields.

    Checkpoints are saved/restored as this dict so OPTIONAL state fields
    (``ema_params`` is None when train.ema == 0) don't change the on-disk
    structure: orbax's StandardRestore rejects a template whose *keys*
    differ from the saved tree even when the extra field is an empty (None)
    node. Old checkpoints (saved as the 5-field dataclass) match the
    5-key dict template field-for-field.
    """
    return {f: getattr(state, f) for f in state.__dataclass_fields__
            if getattr(state, f) is not None}


def save(manager: ocp.CheckpointManager, state: TrainState) -> None:
    step = int(jax.device_get(state.step))
    manager.save(step, args=ocp.args.StandardSave(_as_tree(state)))


def restore(
    manager: ocp.CheckpointManager,
    template: TrainState,
    step: Optional[int] = None,
) -> Optional[TrainState]:
    """Restore latest (or given) step onto ``template``'s structure/sharding.

    Returns None if no checkpoint exists. A template with EMA enabled can
    only restore checkpoints that carry ``ema_params`` (and vice versa) —
    resuming across an EMA config change is an explicit error.
    """
    if step is not None and step not in manager.all_steps():
        return None  # explicit missing step → same fallback as "no ckpt"
    step = step if step is not None else manager.latest_step()
    if step is None:
        return None
    tree = manager.restore(step, args=ocp.args.StandardRestore(_as_tree(template)))
    return template.replace(**tree)
