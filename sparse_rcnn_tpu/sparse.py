"""Static-shape batched sparse voxel tensor — the core data structure.

Replaces the reference's sparse-tensor handle (SURVEY.md L2/L3: coordinate
manager + feature tensor in the SparseConvNet lineage; reference tree was
empty at survey time, see SURVEY.md §0). TPU-first design decisions:

  * **Everything has a static shape** (SURVEY.md §7 invariant 1): each scene
    owns a fixed-capacity row table; ``nvalid`` marks how many rows are live.
  * **Batched layout** ``[B, M_cap, ...]`` instead of a shared pool with a
    batch column: scenes never interact in sparse convs, per-scene ops are
    ``vmap``-ed, and data parallelism is just sharding the leading axis.
  * Coordinates are kept **lexicographically sorted** (invalid rows sort
    last) so neighbor lookup is binary search and gathers are near-banded.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .ops import coords as coord_ops


@struct.dataclass
class SparseTensor:
    """A batch of sparse voxel grids with fixed row capacity.

    Attributes:
      coords:  int32[B, M, 3] voxel coordinates; rows >= nvalid[b] are padding
               and hold an out-of-range sentinel coordinate.
      feats:   float[B, M, C] per-voxel features; padding rows are zero.
      nvalid:  int32[B] number of live rows per scene.
      stride:  static int — voxel stride of this site set relative to the
               finest level (1 at input, doubles per downsample).
    """

    coords: jax.Array
    feats: jax.Array
    nvalid: jax.Array
    stride: int = struct.field(pytree_node=False, default=1)

    @property
    def batch_size(self) -> int:
        return self.coords.shape[0]

    @property
    def capacity(self) -> int:
        return self.coords.shape[1]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    @property
    def row_mask(self) -> jax.Array:
        """bool[B, M] — True for live rows."""
        m = self.capacity
        return jnp.arange(m, dtype=jnp.int32)[None, :] < self.nvalid[:, None]

    def with_feats(self, feats: jax.Array) -> "SparseTensor":
        """Same site set, new features (zeroed on padding rows)."""
        feats = feats * self.row_mask[..., None].astype(feats.dtype)
        return self.replace(feats=feats)

    def packed_keys(self):
        """(hi, lo) int32[B, M] lexicographic keys; sentinel on padding."""
        return coord_ops.pack_coords(self.coords, self.row_mask)


def make_sparse_tensor(
    coords: jax.Array,
    feats: jax.Array,
    nvalid: jax.Array,
    stride: int = 1,
    assume_sorted: bool = False,
) -> SparseTensor:
    """Build a SparseTensor, sorting rows lexicographically per scene.

    coords int32[B, M, 3], feats [B, M, C], nvalid int32[B]. Padding rows
    may hold anything; they are rewritten to the sentinel and zero feats.
    """
    b, m = coords.shape[0], coords.shape[1]
    mask = jnp.arange(m, dtype=jnp.int32)[None, :] < nvalid[:, None]
    sentinel = coord_ops.COORD_OFFSET - 1  # max representable coordinate
    coords = jnp.where(mask[..., None], coords, sentinel)
    feats = feats * mask[..., None].astype(feats.dtype)
    if not assume_sorted:
        def sort_one(c, f, valid):
            hi, lo = coord_ops.pack_coords(c, valid)
            order = jnp.arange(m, dtype=jnp.int32)
            _, _, sorder = coord_ops.lexsort_keys(hi, lo, order)
            return c[sorder], f[sorder]
        from .ops.batching import map_scenes

        coords, feats = map_scenes(sort_one, coords, feats, mask)
    return SparseTensor(coords=coords, feats=feats, nvalid=nvalid, stride=stride)
