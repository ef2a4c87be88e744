"""The full two-stage detector: backbone → RPN → RoI crop → mask/cls heads.

Functional parity with the reference's model layer (SURVEY.md L4/§3.1;
tree empty at survey, §0): voxelize (upstream) → sparse UNet backbone →
per-voxel proposals → top-k+NMS → 3D RoI crop → per-instance class + mask
grids, plus an auxiliary per-voxel semantic branch. Static shapes end to
end; every output carries a validity mask.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..ops import roi as roi_ops
from ..ops.batching import map_scenes
from ..ops.hierarchy import ScaleSet
from .heads import RoIHead, SemanticHead, sample_mask_at_positions
from .rpn import RPNHead, select_proposals
from .unet import SparseUNet


def expand_boxes(boxes: jax.Array, factor: float) -> jax.Array:
    center = (boxes[..., :3] + boxes[..., 3:]) / 2
    half = (boxes[..., 3:] - boxes[..., :3]) / 2 * factor
    return jnp.concatenate([center - half, center + half], axis=-1)


class SparseRCNN(nn.Module):
    """Flagship model. Returns a dict of raw head outputs (loss-ready)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,
        scales: List[ScaleSet],
        train: bool = False,
        gt_boxes: jax.Array = None,
        gt_boxes_valid: jax.Array = None,
    ) -> Dict[str, jax.Array]:
        bb = self.cfg.backbone
        outs = SparseUNet(
            widths=bb.widths,
            blocks_per_scale=bb.blocks_per_scale,
            kernel_size=bb.kernel_size,
            dtype=self.dtype,
            remat=bb.remat,
            dense_from_scale=bb.dense_from_scale,
            grid_extent=bb.grid_extent,
            downsample=bb.downsample,
            dropout=bb.dropout,
            name="backbone",
        )(feats, scales, train)

        rpn_scales = self.cfg.rpn.rpn_scales or (self.cfg.rpn.rpn_scale,)
        rpn_obj, rpn_boxes, rpn_deltas, rpn_masks = [], [], [], []
        for s in rpn_scales:
            stride = 1 << s
            sites = scales[s]
            m = sites.coords.shape[1]
            smask = jnp.arange(m, dtype=jnp.int32)[None, :] < sites.nvalid[:, None]
            obj_s, boxes_s, deltas_s = RPNHead(
                self.cfg.rpn, stride=stride, dtype=self.dtype,
                name="rpn" if s == rpn_scales[0] else f"rpn_s{s}",
            )(outs[s], sites.coords, smask)
            rpn_obj.append(obj_s)
            rpn_boxes.append(boxes_s)
            rpn_deltas.append(deltas_s)
            rpn_masks.append(smask)

        # pool candidates across scales before top-k + NMS
        obj = jnp.concatenate(rpn_obj, axis=1)
        boxes = jnp.concatenate(rpn_boxes, axis=1)
        rpn_mask = jnp.concatenate(rpn_masks, axis=1)

        props, scores, pmask = select_proposals(obj, boxes, rpn_mask, self.cfg.rpn)

        if train and gt_boxes is not None:
            # Fast-R-CNN-style GT injection: overwrite the lowest-scored
            # proposal slots with GT boxes so the RoI heads see foreground
            # from step 0 (early RPN boxes are too loose to match at IoU
            # 0.25, which would starve the cls/mask losses).
            p = props.shape[1]
            n_inject = min(gt_boxes.shape[1], p // 2)
            gtb = gt_boxes[:, :n_inject]
            gtv = (
                gt_boxes_valid[:, :n_inject]
                if gt_boxes_valid is not None
                else jnp.ones(gtb.shape[:2], bool)
            )
            keep_slots = p - n_inject
            props = jnp.concatenate([props[:, :keep_slots], gtb], axis=1)
            scores = jnp.concatenate(
                [scores[:, :keep_slots],
                 jnp.where(gtv, 0.0, -1e9)], axis=1)
            pmask = jnp.concatenate([pmask[:, :keep_slots], gtv], axis=1)

        crop_boxes = expand_boxes(props, self.cfg.roi.expand)

        # batch policy (unroll vs vmap): ops/batching.py
        roi_feats = map_scenes(
            lambda c, n, f, bx: roi_ops.roi_crop(
                c, n, f, bx, self.cfg.roi.grid_size, stride=1,
            ),
            scales[0].coords, scales[0].nvalid, outs[0], crop_boxes,
        )

        cls_logits, mask_logits = RoIHead(
            self.cfg.roi, self.cfg.num_classes, dtype=self.dtype, name="roi_head"
        )(roi_feats)

        out = {
            # per-RPN-scale tuples (losses need per-scale coords/strides)
            "rpn_obj": tuple(rpn_obj),         # each [B, M_s]
            "rpn_deltas": tuple(rpn_deltas),   # each [B, M_s, 6]
            "rpn_mask": tuple(rpn_masks),      # each [B, M_s]
            "rpn_boxes": tuple(rpn_boxes),     # each [B, M_s, 6]
            "proposals": props,                # [B, P, 6]
            "proposal_scores": scores,         # [B, P]
            "proposal_mask": pmask,            # [B, P]
            "crop_boxes": crop_boxes,          # [B, P, 6] (mask grid frame)
            "cls_logits": cls_logits,          # [B, P, K+1]
            "mask_logits": mask_logits,        # [B, P, G, G, G]
            "backbone_finest": outs[0],        # [B, M0, C0]
        }
        if self.cfg.use_semantic_head:
            out["semantic_logits"] = SemanticHead(
                self.cfg.num_classes, dtype=self.dtype, name="semantic"
            )(outs[0])
        return out


def paint_instance_masks(
    outputs: Dict[str, jax.Array],
    scales: List[ScaleSet],
    masked: bool = True,
):
    """Per-proposal mask logits at every stride-1 voxel center.

    Returns (voxel_mask_logits [B, P, M0], inside [B, P, M0]). With
    ``masked=True`` (inference) voxels outside the crop box get -1e9;
    with ``masked=False`` raw sampled logits are returned (the training
    loss weights outside-voxels to zero instead — same sampling path, so
    train and eval see identical mask geometry). Devoxelize downstream for
    point masks (SURVEY.md §3.2: the metric lives on points).
    """
    coords0 = scales[0].coords
    centers = coords0.astype(jnp.float32) + 0.5

    logits, inside = map_scenes(
        sample_mask_at_positions,
        outputs["mask_logits"], outputs["crop_boxes"], centers,
    )
    if masked:
        logits = jnp.where(inside, logits, -1e9)
    return logits, inside
