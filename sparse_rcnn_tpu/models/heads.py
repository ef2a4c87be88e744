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
    # Measured on v5e (P=128, N=262k): the naive [P, N, 3] formulation runs
    # at ~275ms — the minor dimension of 3 wrecks vectorization AND P·N
    # one-element gathers run at the slow elem-gather rate. This version
    # (a) does all box math per-axis in [P, N] layout and (b) replaces the
    # element gather with a bf16 ROW gather of each (x, y) cell's z-row
    # plus a one-hot dot over G — 17.5ms for the same work. Proposals are
    # chunked so the [chunk, N, G] transient stays bounded.
    g = mask_logits.shape[-1]
    p = mask_logits.shape[0]
    n = positions.shape[0]
    out_dtype = mask_logits.dtype

    cells, inside = [], None
    for a in range(3):
        lo = boxes[:, a:a + 1]
        hi = boxes[:, 3 + a:4 + a]
        rel = (positions[None, :, a] - lo) / jnp.maximum(hi - lo, 1e-6)
        in_a = (rel >= 0.0) & (rel < 1.0)
        inside = in_a if inside is None else (inside & in_a)
        cells.append(jnp.clip((rel * g).astype(jnp.int32), 0, g - 1))
    cx, cy, cz = cells

    # largest divisor of p that is <= 32, so the [chunk, N, G] transient
    # stays bounded for ANY proposal budget (p itself only when p is prime
    # and < 32; a non-divisible p like 500 previously degenerated to one
    # unbounded chunk of size p)
    chunk = max(c for c in range(1, min(32, p) + 1) if p % c == 0)
    nc = p // chunk
    zoh_range = jnp.arange(g, dtype=jnp.int32)

    def one_chunk(args):
        ml, ccx, ccy, ccz = args           # [chunk, ...]
        rowidx = (
            jnp.arange(chunk, dtype=jnp.int32)[:, None] * g + ccx
        ) * g + ccy                         # [chunk, N]
        rows = ml.astype(jnp.bfloat16).reshape(-1, g)[rowidx]  # [chunk, N, G]
        zoh = (ccz[..., None] == zoh_range[None, None, :])
        return jnp.sum(rows * zoh.astype(rows.dtype), axis=-1)

    logits = jax.lax.map(one_chunk, (
        mask_logits.reshape(nc, chunk, g, g, g),
        cx.reshape(nc, chunk, n),
        cy.reshape(nc, chunk, n),
        cz.reshape(nc, chunk, n),
    )).reshape(p, n).astype(out_dtype)
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
