"""Rulebook construction as sort/segment/search ops (no pointer-chasing).

The reference builds rulebooks — per-kernel-offset lists of (input row,
output row) pairs — with a native C++ hash map (SURVEY.md C3/N2; tree empty
at survey, §0). The TPU-native recast (BASELINE north-star) uses the sorted
coordinate table from :mod:`sparse_rcnn_tpu.ops.coords`:

  * **Dense gather form.** Instead of pair lists, a rulebook here is
    ``neighbor_idx int32[K, M_out]``: for output row ``i`` and kernel offset
    ``k``, the input-table row that contributes (or -1). This turns every
    sparse conv into K gathers + K MXU matmuls with *no scatter in the
    forward pass* — gathers and matmuls are what the TPU is good at, and
    per-``k`` the map is injective, so the backward pass is again a gather
    with the transposed rulebook.
  * Lookups go through the bulk sort-merge path (`table_lookup_bulk`):
    all K offsets' queries in one lax.sort + segmented scan. Binary search
    (`table_lookup`) exists as the oracle but large 1-D gathers lower
    poorly in XLA on TPU (~0.4 GB/s measured), so it is not the hot path.

Three rulebook flavors cover the UNet (SURVEY.md C5–C7):
  * submanifold (stride 1, odd kernel, output sites == input sites),
  * strided downsample (kernel == stride, new coarser site set),
  * inverse/upsample (restores a cached finer site set).

All functions are per-scene (vmap over the batch axis upstream).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import coords as coord_ops


def _sorted_keys(coords: jax.Array, nvalid: jax.Array):
    m = coords.shape[0]
    mask = jnp.arange(m, dtype=jnp.int32) < nvalid
    return coord_ops.pack_coords(coords, mask), mask


# Second-half construction for centered (antisymmetric) offset sets:
#   "antisym"  — look up only the first K//2 offsets, derive the rest as
#                per-tap transposes (ONE scatter of K//2 · M elements);
#   "direct"   — query all K-1 offsets through the same single flat
#                sort-merge (2x the sort/scan volume, zero scatters).
# v5e calculus: scatters ~7 ms/M elements vs sort ~2.75 + scans ~2.4 ms/M
# (BASELINE.md) — which side wins depends on the realized hit rate and the
# sort's log factor; both are built so the A/B is one flag on the chip.
_SUBM_SECOND_HALF = "antisym"


def set_subm_second_half(mode: str) -> None:
    """Trace-time A/B switch for submanifold second-half construction."""
    global _SUBM_SECOND_HALF
    assert mode in ("antisym", "direct"), mode
    _SUBM_SECOND_HALF = mode


def submanifold_rulebook(
    coords: jax.Array, nvalid: jax.Array, kernel_size
) -> jax.Array:
    """neighbor_idx int32[K, M] for a submanifold conv on a sorted site set.

    ``idx[k, i]`` = row of ``coords[i] - offset_k`` (the input voxel whose
    contribution lands on output ``i`` through kernel tap ``k``), or -1.
    Offsets are centered (odd kernel). Output sites == input sites.
    """
    m = coords.shape[0]
    (hi, lo), mask = _sorted_keys(coords, nvalid)
    offsets = coord_ops.kernel_offsets(kernel_size, centered=True)
    k = offsets.shape[0]
    center = jnp.where(mask, jnp.arange(m, dtype=jnp.int32), -1)[None]
    if _SUBM_SECOND_HALF == "direct":
        # all non-center offsets through ONE flat sort-merge, no scatters
        offs = jnp.concatenate([offsets[: k // 2], offsets[k // 2 + 1:]])
        q = coords[None, :, :] - offs[:, None, :]         # [K-1, M, 3]
        qhi, qlo = coord_ops.pack_coords(q, mask[None, :])
        full = coord_ops.table_lookup_bulk(hi, lo, qhi, qlo)
        return jnp.concatenate(
            [full[: k // 2], center, full[k // 2:]], axis=0)
    # Two structural freebies halve the lookup work: the centered offset
    # enumeration is antisymmetric (offsets[K-1-k] == -offsets[k]), and
    # idx[-δ] is exactly the transpose of idx[δ] (coords[j] == coords[i]-δ
    # ⟺ coords[i] == coords[j]+δ), so only the first K//2 offsets need
    # lookups; the center tap is the identity on live rows. The K//2
    # offsets' queries go through ONE flat sort-merge (table_lookup_bulk):
    # measured fastest on v5e vs per-offset bitonic merges (XLA's sort has
    # far better constants than hand-rolled compare-exchange stages; the
    # hybrid merge_lookup is kept for callers with genuinely pre-sorted
    # one-off queries).
    half = k // 2
    q = coords[None, :, :] - offsets[:half, None, :]      # [K//2, M, 3]
    qhi, qlo = coord_ops.pack_coords(q, mask[None, :])
    first = coord_ops.table_lookup_bulk(hi, lo, qhi, qlo)
    second = transpose_rulebook(first, m)                 # [K//2, M]
    return jnp.concatenate([first, center, second[::-1]], axis=0)


def downsample_sites(
    coords: jax.Array, nvalid: jax.Array, stride: int, capacity: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Generate the coarser site set for a strided conv (kernel == stride).

    Returns (out_coords int32[capacity, 3] sorted, n_out, overflow).
    Coarse coordinate = floor_divide(fine, stride) — matches the reference's
    output-site generation for non-overlapping downsampling (SURVEY.md §3.5).
    """
    m = coords.shape[0]
    mask = jnp.arange(m, dtype=jnp.int32) < nvalid
    coarse = jnp.where(mask[:, None], coords // stride, coord_ops.COORD_OFFSET - 1)
    ucoords, n_out, _, overflow = coord_ops.unique_coords(coarse, mask, capacity)
    return ucoords, n_out, overflow


def downsample_with_rulebooks(
    coords: jax.Array, nvalid: jax.Array, stride: int, capacity: int
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Coarse site set + down AND up rulebooks in one pass — no table lookups.

    Floor-division by the stride is monotone per axis, so the parents of the
    lexicographically sorted fine sites are themselves sorted: the ``inverse``
    map from :func:`coords.unique_coords` IS the fine→coarse row assignment.
    The down rulebook scatters fine rows by (child-offset code, parent row)
    and the up rulebook is an elementwise select — this replaces the two
    sort-merge lookups of :func:`strided_rulebook` / :func:`inverse_rulebook`
    (kept below as oracles for tests) with O(M) elementwise work.

    Returns (out_coords [capacity,3], n_out, overflow, down_idx [s³,capacity],
    up_idx [s³, M]) with the exact conventions of the oracle functions.
    """
    m = coords.shape[0]
    mask = jnp.arange(m, dtype=jnp.int32) < nvalid
    parent = jnp.where(mask[:, None], coords // stride, coord_ops.COORD_OFFSET - 1)
    # NOTE: parents of sorted sites are NOT sorted (floor-division collapses
    # x values, after which order falls back to y), so the dedup sorts.
    ucoords, n_out, inverse, overflow = coord_ops.unique_coords(
        parent, mask, capacity
    )
    child = coords - parent * stride                       # [m, 3] in [0, s)
    # kernel_offsets(stride, centered=False) enumerates dx outer … dz inner
    code = (child[:, 0] * stride + child[:, 1]) * stride + child[:, 2]
    k = stride ** 3
    ok = mask & (inverse >= 0)                             # overflow victims drop
    rows = jnp.arange(m, dtype=jnp.int32)
    # flat scatter with distinct out-of-bounds slots for dropped rows
    # (duplicate indices serialize TPU scatters)
    flat_dst = jnp.where(ok, code * capacity + inverse, k * capacity + rows)
    down = (
        jnp.full((k * capacity,), -1, jnp.int32)
        .at[flat_dst].set(rows, mode="drop", unique_indices=True)
        .reshape(k, capacity)
    )
    up = jnp.where(
        (code[None, :] == jnp.arange(k, dtype=code.dtype)[:, None]) & ok[None, :],
        inverse[None, :],
        -1,
    )
    return ucoords, n_out, overflow, down, up


def strided_rulebook(
    in_coords: jax.Array,
    in_nvalid: jax.Array,
    out_coords: jax.Array,
    out_nvalid: jax.Array,
    stride: int,
) -> jax.Array:
    """neighbor_idx int32[K, M_out] for a k==s downsampling conv.

    For coarse output row ``o`` and offset δ ∈ [0, s)³:
    ``idx[k, o]`` = row of fine coord ``out_coords[o] * s + δ``, or -1.
    """
    (hi, lo), in_mask = _sorted_keys(in_coords, in_nvalid)
    m_out = out_coords.shape[0]
    out_mask = jnp.arange(m_out, dtype=jnp.int32) < out_nvalid
    offsets = coord_ops.kernel_offsets(stride, centered=False)
    q = out_coords[None, :, :] * stride + offsets[:, None, :]  # [K, M_out, 3]
    qhi, qlo = coord_ops.pack_coords(q, out_mask[None, :])
    return coord_ops.table_lookup_bulk(hi, lo, qhi, qlo)


def inverse_rulebook(
    coarse_coords: jax.Array,
    coarse_nvalid: jax.Array,
    fine_coords: jax.Array,
    fine_nvalid: jax.Array,
    stride: int,
) -> jax.Array:
    """neighbor_idx int32[K, M_fine] for a k==s upsampling (inverse) conv.

    Each fine site has exactly one parent coarse site and one child offset
    δ = fine - s * floor(fine / s); ``idx[k, i]`` = parent row if δ matches
    offset ``k`` else -1. The same gather-matmul executor thus serves the
    inverse conv (rows select their weight tap via the rulebook).
    """
    (hi, lo), _ = _sorted_keys(coarse_coords, coarse_nvalid)
    m_fine = fine_coords.shape[0]
    fine_mask = jnp.arange(m_fine, dtype=jnp.int32) < fine_nvalid
    parent = jnp.where(fine_mask[:, None], fine_coords // stride, coord_ops.COORD_OFFSET - 1)
    child = fine_coords - parent * stride  # [M_fine, 3] in [0, s)
    phi, plo = coord_ops.pack_coords(parent, fine_mask)
    parent_row = coord_ops.table_lookup_bulk(hi, lo, phi, plo)  # [M_fine]
    offsets = coord_ops.kernel_offsets(stride, centered=False)

    def one_offset(off):
        match = jnp.all(child == off[None, :], axis=-1) & fine_mask
        return jnp.where(match, parent_row, -1)

    return jax.vmap(one_offset)(offsets)


def transpose_rulebook(idx: jax.Array, m_in: int) -> jax.Array:
    """Invert a rulebook: t_idx[k, j] = i where idx[k, i] == j, else -1.

    PRECONDITION: each per-offset row ``idx[k, :]`` must be injective on its
    non-negative entries (no input row referenced twice by one tap). All
    conv rulebooks here satisfy this by construction (a site has at most one
    neighbor at a fixed offset). The scatter below passes
    ``unique_indices=True``, so violating it gives undefined results (not
    last-write-wins). Used by the custom VJP so the backward pass is gathers
    too (SURVEY.md §7 invariant 4).
    """
    k, m_out = idx.shape
    src = jnp.broadcast_to(jnp.arange(m_out, dtype=jnp.int32)[None, :], (k, m_out))
    # Missing entries get DISTINCT out-of-bounds destinations (m_in + i):
    # mode="drop" skips them without writing, and the distinctness lets the
    # compiler parallelize (duplicate indices — e.g. one shared dump slot —
    # force XLA to serialize scatter writes: measured 400x slower on v5e).
    dst = jnp.where(idx >= 0, idx, m_in + src)

    def one(d, s):
        return (
            jnp.full((m_in,), -1, jnp.int32)
            .at[d].set(s, mode="drop", unique_indices=True)
        )

    return jax.vmap(one)(dst, src)
