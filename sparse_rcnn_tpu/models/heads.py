"""Per-RoI mask + classification heads (SURVEY.md C13).

The RoI crop yields a dense, padded [B, P, D, D, D, C] block — from here on
everything is dense 3D convs with static shapes, which XLA maps straight
onto the MXU (BASELINE: "per-instance mask head run as fused dense-padded
kernels with static shapes"). The mask branch upsamples D → 2D via a
transposed conv, Mask-R-CNN style; the class branch pools and classifies
(background = logit index ``num_classes``).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import RoIConfig
from .layers import MLP


class RoIHead(nn.Module):
    """[B, P, D, D, D, C] → (cls_logits [B, P, K+1], mask_logits [B, P, 2D,2D,2D])."""

    cfg: RoIConfig
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
        b, p, d = roi_feats.shape[0], roi_feats.shape[1], roi_feats.shape[2]
        h = self.cfg.hidden
        x = roi_feats.reshape(b * p, d, d, d, roi_feats.shape[-1]).astype(self.dtype)
        x = nn.Conv(h, (3, 3, 3), dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(h, (3, 3, 3), dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)

        # classification branch
        pooled = jnp.mean(x, axis=(1, 2, 3))  # [B*P, h]
        cls = MLP((h, self.num_classes + 1), dtype=jnp.float32, name="cls")(pooled)
        cls_logits = cls.reshape(b, p, self.num_classes + 1)

        # mask branch: upsample D → 2D, then 1x1 to a single logit channel
        m = nn.ConvTranspose(h, (2, 2, 2), strides=(2, 2, 2), dtype=self.dtype, name="up")(x)
        m = nn.relu(m)
        m = nn.Conv(1, (1, 1, 1), dtype=jnp.float32, name="mask_pred")(m)
        dm = 2 * d
        mask_logits = m.reshape(b, p, dm, dm, dm)
        return cls_logits, mask_logits


def sample_mask_at_positions(
    mask_logits: jax.Array, boxes: jax.Array, positions: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Evaluate each RoI's mask grid at arbitrary scene positions.

    Per scene: mask_logits [P, G, G, G], boxes [P, 6], positions [N, 3]
    → (logits [P, N], inside bool[P, N]). Nearest-cell sampling in the
    box-normalized grid; used to paint per-voxel / per-point instance
    masks at inference (feeds the un-voxelizer, SURVEY.md §3.2).
    """
    g = mask_logits.shape[-1]
    lo, hi = boxes[:, None, :3], boxes[:, None, 3:]
    rel = (positions[None, :, :] - lo) / jnp.maximum(hi - lo, 1e-6)
    inside = jnp.all((rel >= 0.0) & (rel < 1.0), axis=-1)
    cell = jnp.clip((rel * g).astype(jnp.int32), 0, g - 1)
    p = mask_logits.shape[0]
    # ONE flat gather (P·N lookups into the tiny [P·G³] table). Gathered in
    # bfloat16: measured 4x faster than f32 element gathers on v5e, and the
    # logits only feed a threshold / sigmoid downstream.
    flat = (
        ((jnp.arange(p, dtype=jnp.int32)[:, None] * g + cell[..., 0]) * g
         + cell[..., 1]) * g + cell[..., 2]
    )
    logits = (
        mask_logits.astype(jnp.bfloat16).reshape(-1)[flat]
    ).astype(mask_logits.dtype)
    return logits, inside


class SemanticHead(nn.Module):
    """Auxiliary per-voxel semantic logits on the finest decoder features."""

    num_classes: int
    hidden: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        return MLP(
            (self.hidden, self.num_classes + 1), dtype=jnp.float32, name="mlp"
        )(feats)
