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
    voxel_instance: jax.Array = None,
) -> RPNTargets:
    """Per-voxel RPN targets at one RPN scale.

    A voxel is positive iff it carries an instance id; it regresses to its
    own instance's box. For coarse scales pass ``voxel_instance`` pooled
    down the hierarchy (see train.loop); default is the stride-1 labels.
    """
    inst = voxel_instance if voxel_instance is not None else gt.voxel_instance
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
    mask: jax.Array         # float[B, P, M0] matched-instance membership per voxel
    mask_weight: jax.Array  # float[B, P, M0] (live voxel ∧ inside box ∧ fg proposal)
    matched_gt: jax.Array   # int32[B, P] matched instance index (-1 bg)


def roi_targets(
    proposals: jax.Array,
    proposal_mask: jax.Array,
    table_coords: jax.Array,
    table_nvalid: jax.Array,
    gt: SceneGT,
    cfg: ModelConfig,
    mask_grid: int = 0,  # kept for call compatibility; unused
    fg_iou: float = 0.25,
) -> RoITargets:
    """Match proposals to GT boxes; build class + per-voxel mask targets.

    Mask supervision lives on the ACTUAL stride-1 voxels inside each
    foreground proposal's box — the same places the mask grid is sampled
    at inference (paint → devoxelize) — so train and eval are exactly
    aligned and targets carry no grid-resampling noise. This mirrors the
    reference's "classify the voxels inside each RoI" formulation
    (SURVEY.md C13/§0.1).
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

        # per-voxel membership of the matched instance, weighted to voxels
        # inside the (crop) box of each fg proposal
        m = tcoords.shape[0]
        centers = tcoords.astype(jnp.float32) + 0.5            # [M, 3]
        rel = (centers[None, :, :] - props[:, None, :3]) / jnp.maximum(
            props[:, None, 3:] - props[:, None, :3], 1e-6
        )
        inside = jnp.all((rel >= 0.0) & (rel < 1.0), axis=-1)  # [P, M]
        live = jnp.arange(m, dtype=jnp.int32)[None, :] < tnvalid
        target = (vinst[None, :] == matched[:, None]) & (matched[:, None] >= 0)
        weight = (inside & live & fg[:, None]).astype(jnp.float32)
        return (
            cls_t.astype(jnp.int32), cls_w,
            target.astype(jnp.float32), weight, matched,
        )

    cls_t, cls_w, mask_t, mask_w, matched = jax.vmap(one)(
        proposals, proposal_mask, table_coords, table_nvalid,
        gt.boxes, gt.classes, gt.valid, gt.voxel_instance,
    )
    return RoITargets(cls=cls_t, cls_weight=cls_w, mask=mask_t,
                      mask_weight=mask_w, matched_gt=matched)
