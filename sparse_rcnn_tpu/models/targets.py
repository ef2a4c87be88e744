"""Target assignment (SURVEY.md C14) — static-shape, masked.

Ground truth per batch (all capacity-padded, see :class:`SceneGT`):
instance boxes derive from instance point labels (min/max extent), and the
per-voxel instance id at the stride-1 table is carried through voxelization
— so RPN positives are exact ("a voxel belongs to instance i"), not IoU
heuristics, while RoI matching uses 3D IoU against GT boxes like the
reference's two-stage assignment.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import ModelConfig
from ..ops import nms as nms_ops
from ..ops import roi as roi_ops
from .rpn import encode_box_targets


@struct.dataclass
class SceneGT:
    """Padded ground truth for a batch of scenes.

    boxes:          float[B, I, 6] instance AABBs, stride-1 voxel units.
    classes:        int32[B, I] semantic class per instance (-1 = pad).
    valid:          bool[B, I].
    voxel_instance: int32[B, M0] instance index per stride-1 voxel (-1 none).
    voxel_semantic: int32[B, M0] semantic class per voxel (-1 = unlabeled).
    """

    boxes: jax.Array
    classes: jax.Array
    valid: jax.Array
    voxel_instance: jax.Array
    voxel_semantic: jax.Array


@struct.dataclass
class RPNTargets:
    objectness: jax.Array   # float[B, M] 0/1
    obj_weight: jax.Array   # float[B, M] (0 on padding rows)
    box_deltas: jax.Array   # float[B, M, 6]
    box_weight: jax.Array   # float[B, M] (1 on positive rows)


def rpn_targets(
    coords: jax.Array,
    row_mask: jax.Array,
    gt: SceneGT,
    box_norm: float,
    stride: int,
) -> RPNTargets:
    """Per-voxel RPN targets at the RPN scale (default: finest, stride 1).

    A voxel is positive iff it carries an instance id; it regresses to its
    own instance's box.
    """
    inst = gt.voxel_instance  # [B, M] (valid at stride 1 == RPN scale)
    pos = (inst >= 0) & row_mask
    safe = jnp.clip(inst, 0, gt.boxes.shape[1] - 1)
    matched_box = jnp.take_along_axis(
        gt.boxes, safe[..., None].repeat(6, -1), axis=1
    )
    deltas = encode_box_targets(coords, matched_box, box_norm, stride)
    return RPNTargets(
        objectness=pos.astype(jnp.float32),
        obj_weight=row_mask.astype(jnp.float32),
        box_deltas=jnp.where(pos[..., None], deltas, 0.0),
        box_weight=pos.astype(jnp.float32),
    )


@struct.dataclass
class RoITargets:
    cls: jax.Array          # int32[B, P] target class (num_classes = background)
    cls_weight: jax.Array   # float[B, P]
    mask: jax.Array         # float[B, P, G, G, G] 0/1 occupancy of matched instance
    mask_weight: jax.Array  # float[B, P] (1 on foreground proposals)
    matched_gt: jax.Array   # int32[B, P] matched instance index (-1 bg)


def roi_targets(
    proposals: jax.Array,
    proposal_mask: jax.Array,
    table_coords: jax.Array,
    table_nvalid: jax.Array,
    gt: SceneGT,
    cfg: ModelConfig,
    mask_grid: int,
    fg_iou: float = 0.25,
) -> RoITargets:
    """Match proposals to GT boxes; build class + mask-grid targets.

    The mask target for a foreground proposal is the matched instance's
    voxel occupancy sampled at the proposal's mask-grid cell centers
    (nearest stride-1 voxel).
    """
    num_classes = cfg.num_classes

    def one(props, pmask, tcoords, tnvalid, gboxes, gcls, gvalid, vinst):
        iou = nms_ops.box_iou_3d(props, gboxes)  # [P, I]
        iou = jnp.where(gvalid[None, :], iou, -1.0)
        best = jnp.argmax(iou, axis=1).astype(jnp.int32)
        best_iou = jnp.take_along_axis(iou, best[:, None], axis=1)[:, 0]
        fg = (best_iou >= fg_iou) & pmask
        matched = jnp.where(fg, best, -1)
        cls_t = jnp.where(fg, gcls[jnp.clip(best, 0, gcls.shape[0] - 1)], num_classes)
        cls_w = pmask.astype(jnp.float32)

        # mask-grid targets: sample instance ids at grid cell centers
        pos = roi_ops.roi_grid_positions(props, mask_grid)  # [P, G³, 3]
        inst_at = roi_ops.sample_nearest(tcoords, tnvalid, vinst, pos, stride=1, fill_value=-1)
        target = (inst_at == matched[:, None]) & fg[:, None]
        g = mask_grid
        return (
            cls_t.astype(jnp.int32),
            cls_w,
            target.reshape(-1, g, g, g).astype(jnp.float32),
            fg.astype(jnp.float32),
            matched,
        )

    cls_t, cls_w, mask_t, mask_w, matched = jax.vmap(one)(
        proposals, proposal_mask, table_coords, table_nvalid,
        gt.boxes, gt.classes, gt.valid, gt.voxel_instance,
    )
    return RoITargets(cls=cls_t, cls_weight=cls_w, mask=mask_t,
                      mask_weight=mask_w, matched_gt=matched)
