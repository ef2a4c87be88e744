"""Loss functions (SURVEY.md C15): RPN BCE + box L1, RoI CE, mask BCE.

All losses are masked means over static-shape tensors; weights come from
TrainConfig.loss_weights = (rpn_obj, rpn_box, roi_cls, roi_mask).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .targets import RoITargets, RPNTargets


def _masked_mean(x: jax.Array, w: jax.Array) -> jax.Array:
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def rpn_loss(
    obj_logits: jax.Array, boxes_deltas_raw: jax.Array, t: RPNTargets
) -> Tuple[jax.Array, jax.Array]:
    """(objectness BCE, box L1). ``boxes_deltas_raw`` are the head's
    normalized predictions re-encoded — see detector (it passes deltas)."""
    obj = _masked_mean(
        optax.sigmoid_binary_cross_entropy(obj_logits, t.objectness), t.obj_weight
    )
    box = _masked_mean(
        jnp.sum(jnp.abs(boxes_deltas_raw - t.box_deltas), axis=-1), t.box_weight
    )
    return obj, box


def roi_cls_loss(cls_logits: jax.Array, t: RoITargets) -> jax.Array:
    ce = optax.softmax_cross_entropy_with_integer_labels(cls_logits, t.cls)
    return _masked_mean(ce, t.cls_weight)


def roi_mask_loss(voxel_mask_logits: jax.Array, t: RoITargets) -> jax.Array:
    """BCE at the stride-1 voxels inside each fg proposal ([B, P, M0])."""
    bce = optax.sigmoid_binary_cross_entropy(voxel_mask_logits, t.mask)
    return _masked_mean(bce, t.mask_weight)


def semantic_loss(
    sem_logits: jax.Array, voxel_semantic: jax.Array, row_mask: jax.Array,
    num_classes: int,
) -> jax.Array:
    labeled = (voxel_semantic >= 0) & row_mask
    safe = jnp.clip(voxel_semantic, 0, num_classes)
    ce = optax.softmax_cross_entropy_with_integer_labels(sem_logits, safe)
    return _masked_mean(ce, labeled.astype(jnp.float32))


def total_loss(parts: Dict[str, jax.Array], weights) -> jax.Array:
    w_obj, w_box, w_cls, w_mask = weights
    total = (
        w_obj * parts["rpn_obj"]
        + w_box * parts["rpn_box"]
        + w_cls * parts["roi_cls"]
        + w_mask * parts["roi_mask"]
    )
    if "semantic" in parts:
        total = total + parts["semantic"]
    return total
