"""Device-side ground-truth construction from labeled point clouds.

Reference equivalent: GT boxes derived from instance point labels + IoU
matching targets (SURVEY.md C14; tree empty at survey, §0). Everything here
is segment ops over static capacities, vmapped over scenes:

  * per-voxel instance/semantic labels: segment-max over the point→voxel map
    (a voxel takes the highest instance id among its points — ties are rare
    at sane voxel sizes and any deterministic choice is valid),
  * instance AABBs: segment-min/max of point positions per instance id,
  * instance classes: segment-max of point semantic labels per instance.

Positions are converted to stride-1 *voxel units* (position / voxel_size)
so boxes live in the same frame as voxel coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.targets import SceneGT


def build_scene_gt(
    points: jax.Array,
    valid: jax.Array,
    point_instance: jax.Array,
    point_semantic: jax.Array,
    p2v: jax.Array,
    voxel_capacity: int,
    voxel_size,
    max_instances: int,
    base: jax.Array = None,
) -> SceneGT:
    """Batched: points [B,N,3], labels int32[B,N], p2v int32[B,N] → SceneGT.

    ``base`` int32[B,3]: the per-scene integer rebase applied to voxel
    coords (ops.voxelize.rebase_coords) — boxes get the same shift so GT
    and voxel geometry share one frame.
    """
    vs = jnp.asarray(voxel_size, dtype=points.dtype)
    if base is None:
        base = jnp.zeros((points.shape[0], 3), jnp.int32)

    def one(pts, vld, pinst, psem, pv, bs):
        n = pts.shape[0]
        pos = pts / vs - bs.astype(pts.dtype)  # rebased stride-1 voxel units

        # --- per-voxel labels (segment max over the p2v map) ---
        seg_v = jnp.where((pv >= 0) & vld, pv, voxel_capacity)
        vinst = jax.ops.segment_max(
            jnp.where(vld, pinst, -1), seg_v, num_segments=voxel_capacity + 1
        )[:voxel_capacity]
        vsem = jax.ops.segment_max(
            jnp.where(vld, psem, -1), seg_v, num_segments=voxel_capacity + 1
        )[:voxel_capacity]
        # segment_max of empty segments yields dtype-min → clamp to -1
        vinst = jnp.maximum(vinst, -1)
        vsem = jnp.maximum(vsem, -1)

        # --- instance boxes ---
        has_inst = (pinst >= 0) & vld
        seg_i = jnp.where(has_inst, pinst, max_instances)
        big = jnp.asarray(1e9, pos.dtype)
        lo = jax.ops.segment_min(
            jnp.where(has_inst[:, None], pos, big), seg_i,
            num_segments=max_instances + 1,
        )[:max_instances]
        hi = jax.ops.segment_max(
            jnp.where(has_inst[:, None], pos, -big), seg_i,
            num_segments=max_instances + 1,
        )[:max_instances]
        counts = jax.ops.segment_sum(
            has_inst.astype(jnp.int32), seg_i, num_segments=max_instances + 1
        )[:max_instances]
        ivalid = counts > 0
        boxes = jnp.where(
            ivalid[:, None], jnp.concatenate([lo, hi], -1), 0.0
        )

        # --- instance classes ---
        icls = jax.ops.segment_max(
            jnp.where(has_inst, psem, -1), seg_i, num_segments=max_instances + 1
        )[:max_instances]
        icls = jnp.where(ivalid, jnp.maximum(icls, -1), -1)

        return boxes, icls.astype(jnp.int32), ivalid, vinst.astype(jnp.int32), vsem.astype(jnp.int32)

    boxes, classes, ivalid, vinst, vsem = jax.vmap(one)(
        points, valid, point_instance, point_semantic, p2v, base
    )
    return SceneGT(
        boxes=boxes, classes=classes, valid=ivalid,
        voxel_instance=vinst, voxel_semantic=vsem,
    )
