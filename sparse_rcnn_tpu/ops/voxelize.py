"""Voxelization / devoxelization as XLA sort-segment ops.

Reference behavior (SURVEY.md C1/C25; reference tree empty, see §0): quantize
points to integer voxel coordinates at voxel size v, deduplicate, average
features per voxel, and keep the point→voxel map so per-voxel predictions can
be projected back onto points (the ScanNet metric is computed on points).

TPU-native recast (BASELINE north-star: "voxelization ... become XLA-friendly
sort/segment ops"): floor-divide → pack keys → lexsort → segment boundaries →
``segment_sum`` feature averaging, all with static shapes and a fixed voxel
capacity. A C++ host-side twin lives in ``sparse_rcnn_tpu/native`` for the
input pipeline; this module is the on-device implementation and the oracle
for parity tests.

Anisotropic voxel sizes (per-axis ``voxel_size``) are supported for the
SemanticKITTI config (BASELINE config 4).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import coords as coord_ops


def voxelize_scene(
    points: jax.Array,
    feats: jax.Array,
    valid: jax.Array,
    voxel_size,
    capacity: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Voxelize one scene's point cloud.

    Args:
      points: float[N, 3] point positions.
      feats:  float[N, C] per-point features.
      valid:  bool[N] live-point mask (points are capacity-padded too).
      voxel_size: scalar or [3] voxel edge length(s).
      capacity: M — fixed voxel table capacity.

    Returns:
      (vcoords int32[M, 3] sorted, vfeats float[M, C] segment means,
       n_voxels int32, p2v int32[N] point→voxel row (-1 for invalid/dropped),
       overflow int32).
    """
    vs = jnp.asarray(voxel_size, dtype=points.dtype)
    ic = jnp.floor(points / vs).astype(jnp.int32)
    ucoords, n_voxels, p2v, overflow = coord_ops.unique_coords(ic, valid, capacity)
    # segment-mean features: sum per voxel / count per voxel
    seg = jnp.where(p2v >= 0, p2v, capacity)  # dropped rows -> scratch bucket
    sums = jax.ops.segment_sum(
        feats * valid[:, None].astype(feats.dtype), seg, num_segments=capacity + 1
    )[:capacity]
    counts = jax.ops.segment_sum(
        valid.astype(feats.dtype), seg, num_segments=capacity + 1
    )[:capacity]
    vfeats = sums / jnp.maximum(counts, 1.0)[:, None]
    return ucoords, vfeats, n_voxels, p2v, overflow


def voxelize_batch(
    points: jax.Array,
    feats: jax.Array,
    valid: jax.Array,
    voxel_size,
    capacity: int,
):
    """Voxelize a batch of scenes → (SparseTensor, p2v int32[B, N], overflow[B])."""
    from ..sparse import SparseTensor  # deferred: avoids circular import

    from .batching import map_scenes

    vc, vf, nv, p2v, ovf = map_scenes(
        lambda p, f, m: voxelize_scene(p, f, m, voxel_size, capacity),
        points, feats, valid,
    )
    st = SparseTensor(coords=vc, feats=vf, nvalid=nv, stride=1)
    # unique_coords output is already lexicographically sorted with sentinel
    # padding; re-assert padding invariants cheaply.
    sentinel = coord_ops.COORD_OFFSET - 1
    mask = st.row_mask
    st = st.replace(
        coords=jnp.where(mask[..., None], st.coords, sentinel),
        feats=st.feats * mask[..., None].astype(st.feats.dtype),
    )
    return st, p2v, ovf


def rebase_coords(st, margin: int = 2):
    """Shift each scene's coords so the minimum live coordinate sits at
    ``margin`` (non-negative frame — required by the dense backbone tail,
    harmless otherwise: integer translation commutes with every geometric
    op bit-for-bit, and sorting order is translation-invariant).

    Returns (rebased SparseTensor, base int32[B, 3]) with
    ``new_coords == old_coords - base`` on live rows; padding rows keep the
    sentinel. Callers must shift any point-derived geometry by the same
    base (see train.loop.prepare_inputs / data.gt.build_scene_gt).
    """
    mask = st.row_mask
    big = jnp.int32(coord_ops.COORD_OFFSET)
    cmin = jnp.min(
        jnp.where(mask[..., None], st.coords, big), axis=1
    )  # [B, 3]
    any_live = jnp.any(mask, axis=1)
    base = jnp.where(any_live[:, None], cmin - margin, 0).astype(jnp.int32)
    sentinel = coord_ops.COORD_OFFSET - 1
    new_coords = jnp.where(
        mask[..., None], st.coords - base[:, None, :], sentinel
    )
    return st.replace(coords=new_coords), base


def devoxelize(voxel_values: jax.Array, p2v: jax.Array, fill_value=0):
    """Map per-voxel values [B, M, ...] back to points via p2v [B, N].

    Points whose voxel was dropped (p2v == -1) get ``fill_value``.
    Reference parity: SURVEY.md C25 (un-voxelizer) — needed because the
    ScanNet instance-mAP protocol scores *point* masks.
    """
    from .batching import map_scenes

    def one(vals, idx):
        safe = jnp.clip(idx, 0, vals.shape[0] - 1)
        out = vals[safe]
        keep = (idx >= 0)
        return jnp.where(
            keep.reshape(keep.shape + (1,) * (out.ndim - keep.ndim)),
            out,
            jnp.asarray(fill_value, out.dtype),
        )
    # batch policy (ops/batching.py): the N-point row gather must not take
    # XLA's vmapped (batched) emitter — unroll/shard_map over scenes
    return map_scenes(one, voxel_values, p2v)
