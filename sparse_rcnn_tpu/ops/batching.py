"""Per-scene batch mapping policy.

Single chip: UNROLL the (static) batch — ``lax.sort``/gather/scatter under
``vmap`` take XLA's batched emitters, measured ~2.5x slower than the flat
forms on v5e even at batch 1 (BASELINE.md perf notes).

Multi-device (GSPMD data parallel, BASELINE config 5): the parallel step
builders (:mod:`..parallel.mesh`) enter :func:`shard_context` at trace
time, and :func:`map_scenes` then runs the per-scene bodies inside a
``shard_map`` over the data axis, unrolling the *per-device local* batch —
every device touches only its own scenes AND every sort/gather/scatter
keeps its fast flat (unbatched) emitter. Without an active shard context,
multi-device tracing falls back to ``vmap`` (correct everywhere, slower),
which remains the right choice for callers that jit without a mesh.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_ctx = threading.local()


@contextmanager
def shard_context(mesh, axis: str = "data"):
    """Trace-time context: map_scenes uses shard_map(local-unroll) over
    ``mesh``'s ``axis`` instead of vmap. Entered by the parallel step
    builders around tracing; nests (innermost wins)."""
    prev = getattr(_ctx, "val", None)
    _ctx.val = (mesh, axis)
    try:
        yield
    finally:
        _ctx.val = prev


def _current_context():
    return getattr(_ctx, "val", None)


def unrolling_enabled() -> bool:
    return jax.device_count() == 1


def _unroll(fn, *args):
    b = args[0].shape[0]
    outs = [fn(*(a[i] for a in args)) for i in range(b)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)


def map_scenes(fn, *args):
    """Apply per-scene ``fn`` over the leading batch axis of ``args``."""
    ctx = _current_context()
    if ctx is not None and jax.device_count() > 1:
        mesh, axis = ctx
        shard_map = jax.shard_map if hasattr(jax, "shard_map") else (
            __import__("jax.experimental.shard_map",
                       fromlist=["shard_map"]).shard_map)
        spec = P(axis)
        return shard_map(
            lambda *la: _unroll(fn, *la),
            mesh=mesh,
            in_specs=tuple(spec for _ in args),
            out_specs=spec,
            check_vma=False,
        )(*args)
    if unrolling_enabled():
        return _unroll(fn, *args)
    return jax.vmap(fn)(*args)
