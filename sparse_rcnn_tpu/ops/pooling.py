"""Sparse pooling ops (SURVEY.md C6 pooling variants).

Max/avg pooling reuse the strided (k==s) rulebook: a coarse site pools over
its up-to-8 children — one masked reduce over gathered rows, no scatter.
Global pooling reduces live rows per scene.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .batching import map_scenes as _map_scenes


def _gather(feats: jax.Array, idx: jax.Array, fill: float) -> jax.Array:
    """feats [M,C], idx [K,M_out] → [K, M_out, C] with ``fill`` at -1."""
    safe = jnp.clip(idx, 0, feats.shape[0] - 1)
    g = feats[safe]
    return jnp.where((idx >= 0)[..., None], g, jnp.asarray(fill, g.dtype))


def max_pool(feats: jax.Array, down_idx: jax.Array) -> jax.Array:
    """Batched sparse max pool: feats [B,M,C], down_idx [B,K,M_out]."""
    def one(f, ix):
        g = _gather(f, ix, -jnp.inf)
        out = jnp.max(g, axis=0)
        any_child = jnp.any(ix >= 0, axis=0)
        return jnp.where(any_child[:, None], out, 0.0).astype(f.dtype)

    return _map_scenes(one, feats, down_idx)  # batch policy: ops/batching.py


def avg_pool(feats: jax.Array, down_idx: jax.Array) -> jax.Array:
    """Batched sparse average pool over live children."""
    def one(f, ix):
        g = _gather(f, ix, 0.0)
        cnt = jnp.sum((ix >= 0), axis=0).astype(f.dtype)
        return (jnp.sum(g, axis=0) / jnp.maximum(cnt, 1.0)[:, None]).astype(f.dtype)

    return _map_scenes(one, feats, down_idx)


def global_pool(feats: jax.Array, nvalid: jax.Array, mode: str = "mean") -> jax.Array:
    """[B, M, C] → [B, C] over live rows."""
    m = feats.shape[1]
    mask = (jnp.arange(m, dtype=jnp.int32)[None, :] < nvalid[:, None])[..., None]
    if mode == "max":
        neg = jnp.asarray(-jnp.inf, feats.dtype)
        return jnp.max(jnp.where(mask, feats, neg), axis=1)
    s = jnp.sum(feats * mask.astype(feats.dtype), axis=1)
    return s / jnp.maximum(nvalid[:, None].astype(feats.dtype), 1.0)
