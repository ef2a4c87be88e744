"""GSPMD data parallelism over a device mesh (BASELINE config 5).

The reference at most uses torch DDP (SURVEY.md §2 parallelism table); the
TPU build scales by sharding the scene batch over a 1-D ``('data',)`` mesh
with ``jax.jit`` + ``NamedSharding`` — XLA inserts the gradient psum over
ICI, parameters/optimizer state stay replicated. No other parallelism axes
are needed at this model scale (SURVEY.md §2: TP/PP/SP/EP explicitly N/A —
channel widths ≤ a few hundred and the model fits in one chip's HBM; the
mesh is built rank-2 ``(data, model)`` with model=1 so a TP axis can be
enabled later without changing call sites).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..train import loop as train_loop


def make_mesh(num_devices: int = 0, data_axis: str = "data") -> Mesh:
    devs = jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs).reshape(len(devs), 1), (data_axis, "model"))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Scenes sharded over the data axis; all inner dims replicated."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh, data_axis: str = "data"):
    spec = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), batch)


def make_parallel_train_step(cfg: Config, mesh: Mesh):
    """jit-compiled DP train step: state replicated, batch data-sharded.

    The step body runs under :func:`..ops.batching.shard_context`, so every
    per-scene sort/gather/scatter unrolls the per-device LOCAL batch inside
    a ``shard_map`` — no vmapped (batched-emitter, measured ~2.5x slower)
    forms anywhere, and no device ever touches another device's scenes.
    """
    from ..ops import batching

    data_axis = cfg.parallel.data_axis
    rep = replicated(mesh)
    bspec = batch_sharding(mesh, data_axis)

    def step(state, batch):
        with batching.shard_context(mesh, data_axis):
            return train_loop.train_step(cfg, state, batch)

    return jax.jit(
        step,
        in_shardings=(rep, bspec),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_parallel_eval_step(cfg: Config, mesh: Mesh):
    from ..ops import batching

    data_axis = cfg.parallel.data_axis
    rep = replicated(mesh)
    bspec = batch_sharding(mesh, data_axis)

    def step(state, batch):
        with batching.shard_context(mesh, data_axis):
            return train_loop.eval_step(cfg, state, batch)

    return jax.jit(step, in_shardings=(rep, bspec))


def replicate_state(state, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
