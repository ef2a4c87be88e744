"""Region-proposal head: anchor-free per-voxel objectness + 3D boxes.

Reference: per-voxel/anchor objectness + box regression on decoder scale(s)
(SURVEY.md C10/C11; tree empty at survey, §0). TPU recast: a center-based
(anchor-free) head — each live voxel predicts one box — followed by
static-budget top-k + padded 3D NMS. All shapes static: the proposal list
is always [B, P] with a validity mask.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import RPNConfig
from ..ops import nms as nms_ops
from .layers import MLP


class RPNHead(nn.Module):
    """feats [B, M, C] → (obj_logits [B, M], boxes [B, M, 6])."""

    cfg: RPNConfig
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array, coords: jax.Array, mask: jax.Array):
        h = MLP((self.cfg.hidden, self.cfg.hidden), dtype=self.dtype, name="trunk")(feats)
        out = nn.Dense(7, dtype=jnp.float32, name="pred")(h)
        obj = out[..., 0]
        d_center = out[..., 1:4]
        d_size = jnp.clip(out[..., 4:7], -4.0, 4.0)
        deltas = jnp.concatenate([d_center, d_size], axis=-1)
        norm = self.cfg.box_norm * self.stride
        vc = (coords.astype(jnp.float32) + 0.5) * self.stride  # voxel centers
        center = vc + d_center * norm
        size = jnp.exp(d_size) * norm
        boxes = jnp.concatenate([center - size / 2, center + size / 2], axis=-1)
        obj = jnp.where(mask, obj, -1e9)
        return obj, boxes, deltas


def encode_box_targets(
    coords: jax.Array, gt_boxes: jax.Array, box_norm: float, stride: int
) -> jax.Array:
    """Inverse of the head's decoding — regression targets for matched voxels.

    coords int32[..., 3] (at ``stride``), gt_boxes float[..., 6] → [..., 6]
    (d_center, d_logsize) in the head's normalized parameterization.
    """
    norm = box_norm * stride
    vc = (coords.astype(jnp.float32) + 0.5) * stride
    gt_center = (gt_boxes[..., :3] + gt_boxes[..., 3:]) / 2
    gt_size = jnp.maximum(gt_boxes[..., 3:] - gt_boxes[..., :3], 1e-4)
    d_center = (gt_center - vc) / norm
    d_size = jnp.log(gt_size / norm)
    return jnp.concatenate([d_center, d_size], axis=-1)


def select_proposals(
    obj_logits: jax.Array,
    boxes: jax.Array,
    valid: jax.Array,
    cfg: RPNConfig,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Static top-k + NMS per scene → (boxes [B,P,6], scores [B,P], mask [B,P]).

    Gradients are stopped: proposal geometry is a hard decision, exactly as
    in the reference's two-stage training (SURVEY.md §3.1).
    """
    obj_logits = jax.lax.stop_gradient(obj_logits)
    boxes = jax.lax.stop_gradient(boxes)

    def one(scores_m, boxes_m, valid_m):
        vals, idx, mask = nms_ops.topk_rows(scores_m, valid_m, cfg.pre_nms_topk)
        cand_boxes = boxes_m[idx]
        keep_idx, keep_mask = nms_ops.nms_3d(
            cand_boxes, vals, mask, cfg.nms_iou_threshold, cfg.num_proposals
        )
        safe = jnp.clip(keep_idx, 0, cfg.pre_nms_topk - 1)
        p_boxes = cand_boxes[safe]
        p_scores = jnp.where(keep_mask, vals[safe], -jnp.inf)
        p_mask = keep_mask & (p_scores > jnp.log(cfg.score_threshold / (1 - cfg.score_threshold)))
        return p_boxes, jnp.where(p_mask, p_scores, -1e9), p_mask

    return jax.vmap(one)(obj_logits, boxes, valid)
