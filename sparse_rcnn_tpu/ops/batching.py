"""Per-scene batch mapping policy.

Single chip: UNROLL the (static) batch — ``lax.sort``/gather/scatter under
``vmap`` take XLA's batched emitters, measured ~2.5x slower than the flat
forms on v5e even at batch 1 (BASELINE.md perf notes).

Multi-device (GSPMD data parallel, BASELINE config 5): vmap — an unrolled
loop over a batch-sharded array would make every device touch every scene
(collectives or redundant compute), destroying DP scaling; the batched
emitters are the lesser cost. (A shard_map wrapper that unrolls the
per-device local batch would get both; tracked as future work.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unrolling_enabled() -> bool:
    return jax.device_count() == 1


def map_scenes(fn, *args):
    """Apply per-scene ``fn`` over the leading batch axis of ``args``."""
    if unrolling_enabled():
        b = args[0].shape[0]
        outs = [fn(*(a[i] for a in args)) for i in range(b)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)
    return jax.vmap(fn)(*args)
