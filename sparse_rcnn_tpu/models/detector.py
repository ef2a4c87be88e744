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
        self, feats: jax.Array, scales: List[ScaleSet], train: bool = False
    ) -> Dict[str, jax.Array]:
        bb = self.cfg.backbone
        outs = SparseUNet(
            widths=bb.widths,
            blocks_per_scale=bb.blocks_per_scale,
            kernel_size=bb.kernel_size,
            dtype=self.dtype,
            remat=bb.remat,
            name="backbone",
        )(feats, scales, train)

        s = self.cfg.rpn.rpn_scale
        stride = 1 << s
        rpn_sites = scales[s]
        m = rpn_sites.coords.shape[1]
        rpn_mask = jnp.arange(m, dtype=jnp.int32)[None, :] < rpn_sites.nvalid[:, None]
        obj, boxes, deltas = RPNHead(
            self.cfg.rpn, stride=stride, dtype=self.dtype, name="rpn"
        )(outs[s], rpn_sites.coords, rpn_mask)

        props, scores, pmask = select_proposals(obj, boxes, rpn_mask, self.cfg.rpn)
        crop_boxes = expand_boxes(props, self.cfg.roi.expand)

        roi_feats = jax.vmap(
            lambda c, n, f, bx: roi_ops.roi_crop(
                c, n, f, bx, self.cfg.roi.grid_size, stride=1
            )
        )(scales[0].coords, scales[0].nvalid, outs[0], crop_boxes)

        cls_logits, mask_logits = RoIHead(
            self.cfg.roi, self.cfg.num_classes, dtype=self.dtype, name="roi_head"
        )(roi_feats)

        out = {
            "rpn_obj": obj,                    # [B, M_s]
            "rpn_boxes": boxes,                # [B, M_s, 6]
            "rpn_deltas": deltas,              # [B, M_s, 6]
            "rpn_mask": rpn_mask,              # [B, M_s]
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
    threshold: float = 0.5,
):
    """Inference post-processing: per-proposal voxel masks at stride 1.

    Returns (voxel_mask_logits [B, P, M0], inside [B, P, M0]) — evaluate the
    RoI mask grids at every stride-1 voxel center. Devoxelize downstream to
    get point masks (SURVEY.md §3.2: the metric lives on points).
    """
    coords0 = scales[0].coords
    centers = coords0.astype(jnp.float32) + 0.5

    def one(mask_logits, boxes, pos):
        return sample_mask_at_positions(mask_logits, boxes, pos)

    logits, inside = jax.vmap(one)(
        outputs["mask_logits"], outputs["crop_boxes"], centers
    )
    return logits, inside
