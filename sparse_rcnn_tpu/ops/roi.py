"""3D RoI crop over sparse voxel tables (SURVEY.md C12).

The reference crops backbone voxel features inside each proposal box into a
fixed grid (native op in the repo family; tree empty at survey, §0). The
TPU recast samples a static D³ lattice per box with **trilinear
interpolation over 8 sparse lookups** per sample point — lookups are binary
searches into the scale's sorted coordinate table, so the whole crop is
gathers + elementwise math with fully static [P, D³] shapes (BASELINE:
"fused dense-padded kernels with static shapes").

Empty space (no voxel at a corner) contributes zero, exactly like the
implicit zeros of the sparse tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import coords as coord_ops


def roi_grid_positions(boxes: jax.Array, grid: int) -> jax.Array:
    """Sample positions for each box: [P, grid³, 3] (stride-1 voxel units).

    Cell-center convention: g_i = lo + (i + 0.5) / grid * (hi - lo).
    """
    lo, hi = boxes[..., :3], boxes[..., 3:]
    steps = (jnp.arange(grid, dtype=boxes.dtype) + 0.5) / grid
    gx, gy, gz = jnp.meshgrid(steps, steps, steps, indexing="ij")
    offs = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # [grid³, 3]
    return lo[:, None, :] + offs[None, :, :] * (hi - lo)[:, None, :]


def sample_trilinear(
    table_coords: jax.Array,
    table_nvalid: jax.Array,
    feats: jax.Array,
    positions: jax.Array,
    stride: int = 1,
) -> jax.Array:
    """Trilinearly sample sparse per-voxel features at continuous positions.

    Args (per scene):
      table_coords int32[M, 3] sorted site set at ``stride``; feats [M, C].
      positions float[..., 3] in stride-1 voxel units.
    Returns float[..., C]; zero where no voxels exist.

    A voxel (i,j,k) at ``stride`` s covers positions [i*s, (i+1)*s); its
    feature is anchored at the cell center (i + 0.5) * s.
    """
    m = table_coords.shape[0]
    mask = jnp.arange(m, dtype=jnp.int32) < table_nvalid
    thi, tlo = coord_ops.pack_coords(table_coords, mask)

    q = positions / stride - 0.5  # continuous cell-index space
    base = jnp.floor(q).astype(jnp.int32)
    frac = q - base

    # all 8 corners in ONE bulk sort-merge lookup (1-D gathers are slow in
    # XLA on TPU; batching the corners amortizes the sort)
    offs = jnp.array(
        [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], jnp.int32
    )  # [8, 3]
    cc = base[None, ...] + offs.reshape((8,) + (1,) * (base.ndim - 1) + (3,))
    w = jnp.prod(
        jnp.where(
            offs.reshape((8,) + (1,) * (frac.ndim - 1) + (3,)).astype(frac.dtype) > 0,
            frac[None, ...], 1.0 - frac[None, ...],
        ),
        axis=-1,
    )  # [8, ...]
    qhi, qlo = coord_ops.pack_coords(cc)
    idx = coord_ops.table_lookup_bulk(thi, tlo, qhi, qlo)  # [8, ...]
    safe = jnp.clip(idx, 0, m - 1)
    val = feats[safe] * (idx >= 0)[..., None].astype(feats.dtype)
    return jnp.sum(val * w[..., None].astype(feats.dtype), axis=0)


def sample_nearest(
    table_coords: jax.Array,
    table_nvalid: jax.Array,
    values: jax.Array,
    positions: jax.Array,
    stride: int = 1,
    fill_value=-1,
) -> jax.Array:
    """Nearest-voxel sampling of per-voxel *labels* (no interpolation).

    Used for mask targets: returns values[...] at floor(position / stride),
    or ``fill_value`` where empty.
    """
    m = table_coords.shape[0]
    mask = jnp.arange(m, dtype=jnp.int32) < table_nvalid
    thi, tlo = coord_ops.pack_coords(table_coords, mask)
    cc = jnp.floor(positions / stride).astype(jnp.int32)
    qhi, qlo = coord_ops.pack_coords(cc)
    idx = coord_ops.table_lookup_bulk(thi, tlo, qhi, qlo)
    safe = jnp.clip(idx, 0, m - 1)
    val = values[safe]
    return jnp.where(idx >= 0, val, jnp.asarray(fill_value, values.dtype))


def roi_crop(
    table_coords: jax.Array,
    table_nvalid: jax.Array,
    feats: jax.Array,
    boxes: jax.Array,
    grid: int,
    stride: int = 1,
) -> jax.Array:
    """Crop [P, grid, grid, grid, C] features per box (one scene).

    vmap over scenes upstream. Boxes in stride-1 voxel units.
    """
    pos = roi_grid_positions(boxes, grid)  # [P, grid³, 3]
    sampled = sample_trilinear(table_coords, table_nvalid, feats, pos, stride)
    p = boxes.shape[0]
    return sampled.reshape(p, grid, grid, grid, feats.shape[-1])
