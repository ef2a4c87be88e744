"""3D boxes, IoU, top-k and padded NMS — static shapes throughout.

The reference family uses a native NMS (SURVEY.md C11/N4; tree empty at
survey, §0). On TPU a masked O(P²) greedy NMS over a static pre-NMS budget
is faster than any dynamic-shape cleverness: P ≤ a few hundred, the IoU
matrix is one small matmul-shaped op, and the greedy loop is a
``fori_loop`` with no data-dependent shapes (SURVEY.md §7 hard-part 4).

Boxes are axis-aligned 3D: (x1, y1, z1, x2, y2, z2) in stride-1 voxel units.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def box_volume(boxes: jax.Array) -> jax.Array:
    d = jnp.maximum(boxes[..., 3:] - boxes[..., :3], 0.0)
    return d[..., 0] * d[..., 1] * d[..., 2]


def box_iou_3d(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU: a [N, 6], b [M, 6] → [N, M]."""
    lo = jnp.maximum(a[:, None, :3], b[None, :, :3])
    hi = jnp.minimum(a[:, None, 3:], b[None, :, 3:])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    union = box_volume(a)[:, None] + box_volume(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_3d(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    iou_threshold: float,
    max_outputs: int,
):
    """Greedy NMS with static output budget.

    Args:
      boxes [N, 6], scores [N], valid bool[N].
    Returns:
      (keep_idx int32[max_outputs] (-1 padded), keep_mask bool[max_outputs]).
    """
    n = boxes.shape[0]
    iou = box_iou_3d(boxes, boxes)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s0 = jnp.where(valid, scores, neg_inf)

    def body(i, carry):
        s, keep_idx, keep_mask = carry
        best = jnp.argmax(s)
        ok = s[best] > neg_inf
        keep_idx = keep_idx.at[i].set(jnp.where(ok, best.astype(jnp.int32), -1))
        keep_mask = keep_mask.at[i].set(ok)
        # suppress the winner and everything overlapping it
        suppress = (iou[best] >= iou_threshold) | (
            jnp.arange(n) == best
        )
        s = jnp.where(ok & suppress, neg_inf, s)
        return s, keep_idx, keep_mask

    keep_idx = jnp.full((max_outputs,), -1, jnp.int32)
    keep_mask = jnp.zeros((max_outputs,), bool)
    _, keep_idx, keep_mask = lax.fori_loop(
        0, max_outputs, body, (s0, keep_idx, keep_mask)
    )
    return keep_idx, keep_mask


def topk_rows(scores: jax.Array, valid: jax.Array, k: int):
    """Top-k over valid rows: returns (values, idx int32[k], mask bool[k])."""
    masked = jnp.where(valid, scores, -jnp.inf)
    vals, idx = lax.top_k(masked, k)
    mask = jnp.isfinite(vals)
    return vals, idx.astype(jnp.int32), mask
