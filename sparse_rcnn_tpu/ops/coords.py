"""Coordinate machinery for sparse voxel tables.

TPU-native replacement for the reference's native coordinate hash map
(SURVEY.md C2: reference uses a C++ hash-map extension; unverifiable — the
reference mount was empty, see SURVEY.md §0). Here, coordinate lookup is
recast as XLA-friendly *sort + binary search* over packed integer keys:

  * every (x, y, z) int32 coordinate is packed into a pair of int32 keys
    (no int64 / x64 mode needed on TPU),
  * the table is sorted lexicographically once per site-set via
    ``lax.sort(num_keys=2)`` (runs on device, MXU-independent),
  * point queries are answered by a vectorized branch-free binary search
    (O(log M) gathers, fully unrolled at trace time — static shapes only).

All functions are per-scene; batch via ``jax.vmap``. Invalid (padding) rows
are represented by a sentinel key that sorts after every real key.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Coordinates must lie in [-COORD_OFFSET, COORD_OFFSET). 16 bits per axis
# covers 65k voxels per axis — a 1.3 km scene at 2 cm voxels.
COORD_BITS = 16
COORD_OFFSET = 1 << (COORD_BITS - 1)
# Sentinel key pair for invalid rows: sorts strictly after any real key
# (real hi keys are < 2^16, so the hi sentinel alone is unambiguous).
SENTINEL_HI = jnp.uint32(0xFFFFFFFF)
SENTINEL_LO = jnp.uint32(0xFFFFFFFF)


def pack_coords(coords: jax.Array, valid: jax.Array | None = None) -> Tuple[jax.Array, jax.Array]:
    """Pack int32 coords [..., 3] into a lexicographic (hi, lo) uint32 key pair.

    hi = x + 2^15                       (in [0, 2^16))
    lo = (y + 2^15) * 2^16 + (z + 2^15) (uses the full 32 bits — hence uint32)

    (hi, lo) pairwise unsigned comparison == lexicographic comparison of
    (x, y, z). Rows where ``valid`` is False get the sentinel key pair
    (sorts last; real entries always have hi < 2^16 != SENTINEL_HI).
    """
    x = (coords[..., 0] + COORD_OFFSET).astype(jnp.uint32)
    y = (coords[..., 1] + COORD_OFFSET).astype(jnp.uint32)
    z = (coords[..., 2] + COORD_OFFSET).astype(jnp.uint32)
    hi = x
    lo = (y << COORD_BITS) | z
    if valid is not None:
        hi = jnp.where(valid, hi, SENTINEL_HI)
        lo = jnp.where(valid, lo, SENTINEL_LO)
    return hi, lo


def unpack_coords(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_coords` (undefined for sentinel keys)."""
    x = hi.astype(jnp.int32) - COORD_OFFSET
    y = (lo >> COORD_BITS).astype(jnp.int32) - COORD_OFFSET
    z = (lo & jnp.uint32((1 << COORD_BITS) - 1)).astype(jnp.int32) - COORD_OFFSET
    return jnp.stack([x, y, z], axis=-1)


def lexsort_keys(hi: jax.Array, lo: jax.Array, *extras: jax.Array):
    """Sort (hi, lo) lexicographically, carrying ``extras`` along.

    Returns (hi_sorted, lo_sorted, *extras_sorted). Stable.
    """
    out = lax.sort((hi, lo) + tuple(extras), num_keys=2, is_stable=True)
    return out


def lower_bound(hi: jax.Array, lo: jax.Array, qhi: jax.Array, qlo: jax.Array) -> jax.Array:
    """Vectorized lexicographic lower_bound into a sorted (hi, lo) table.

    ``hi, lo``: sorted int32 [M]. ``qhi, qlo``: queries, any shape.
    Returns the insertion index in [0, M] for each query. Branch-free
    binary search, unrolled ceil(log2(M+1)) times at trace time.
    """
    m = hi.shape[0]
    nsteps = max(1, math.ceil(math.log2(m + 1)))
    low = jnp.zeros(qhi.shape, jnp.int32)
    high = jnp.full(qhi.shape, m, jnp.int32)
    for _ in range(nsteps):
        mid = (low + high) >> 1
        mid_c = jnp.clip(mid, 0, m - 1)
        thi = hi[mid_c]
        tlo = lo[mid_c]
        lt = (thi < qhi) | ((thi == qhi) & (tlo < qlo))
        lt = lt & (mid < m)
        low = jnp.where(lt, mid + 1, low)
        high = jnp.where(lt, high, mid)
    return low


def table_lookup(hi: jax.Array, lo: jax.Array, qhi: jax.Array, qlo: jax.Array) -> jax.Array:
    """Find each query key in the sorted table. Returns index or -1.

    The returned index refers to the *sorted* table order.
    """
    m = hi.shape[0]
    pos = lower_bound(hi, lo, qhi, qlo)
    pos_c = jnp.clip(pos, 0, m - 1)
    # Sentinel queries (invalid rows) must miss even though the table's own
    # padding rows also hold sentinel keys.
    found = (
        (pos < m)
        & (hi[pos_c] == qhi)
        & (lo[pos_c] == qlo)
        & (qhi != SENTINEL_HI)
    )
    return jnp.where(found, pos.astype(jnp.int32), -1)


def _join_sorted(shi, slo, stag, m: int, q: int) -> jax.Array:
    """Shared tail of the bulk lookups: resolve queries in a sorted key stream.

    Input: (hi, lo, tag) sorted ascending by (key, tag) where table rows carry
    tags < m (so they precede queries at equal keys), query rows carry tags in
    [m, m+q), and any additional padding rows carry sentinel keys with tags
    >= m + q. Returns int32[q]: the matching table row per query (original
    query order) or -1.

    Two native cumulative maxes replace a segmented scan (a custom
    associative_scan compiles pathologically slowly here):
      * table row ids appear in sorted order, so cummax of (stag if table)
        is "row of last table entry at or before this position";
      * that entry shares this position's key iff it lies in the current
        run: last-table-position >= current run start.
    """
    n = shi.shape[0]
    is_table = stag < m
    # key-run boundaries (shifted compare; no gathers)
    prev_hi = jnp.concatenate([jnp.array([SENTINEL_HI], jnp.uint32), shi[:-1]])
    prev_lo = jnp.concatenate([jnp.array([SENTINEL_LO], jnp.uint32), slo[:-1]])
    new_run = (shi != prev_hi) | (slo != prev_lo)
    new_run = new_run.at[0].set(True)

    pos = jnp.arange(n, dtype=jnp.int32)
    row = lax.cummax(jnp.where(is_table, stag, -1))
    last_table_pos = lax.cummax(jnp.where(is_table, pos, -1))
    run_start = lax.cummax(jnp.where(new_run, pos, 0))
    ok = (row >= 0) & (last_table_pos >= run_start) & (shi != SENTINEL_HI)
    res = jnp.where(ok, row, -1)

    # Route query results back to input order. Table/padding rows get
    # DISTINCT out-of-bounds destinations (q + pos): mode="drop" skips them,
    # and distinctness (+ unique_indices) avoids the serialized-scatter
    # slow path duplicate indices trigger on TPU.
    # (padding rows land in [q, n-m) via stag - m; table rows in [n-m, 2n-m):
    # disjoint, so the whole index set stays duplicate-free)
    dst = jnp.where(is_table, (n - m) + pos, stag - m)
    return (
        jnp.full((q,), -1, jnp.int32)
        .at[dst].set(res, mode="drop", unique_indices=True)
    )


def table_lookup_bulk(
    hi: jax.Array, lo: jax.Array, qhi: jax.Array, qlo: jax.Array
) -> jax.Array:
    """Bulk sorted-table lookup via sort-merge — the fast path for many queries.

    Semantics identical to :func:`table_lookup` (index into the sorted table
    or -1), but implemented as ONE ``lax.sort`` of table+query keys plus a
    segmented scan, with **no gathers**: measured ~4.5x faster than the
    binary search on v5e, where XLA lowers large 1-D gathers at ~0.4 GB/s
    (the binary search's per-step gathers dominate everything else).

    Algorithm: stable-sort (hi, lo, tag) where table rows get tags < m and
    queries tags >= m, so at equal keys table entries come first; a
    segmented max-scan (reset at key-run boundaries) carries the run's
    table row to every query in the run; results scatter back by tag.
    """
    q_shape = qhi.shape
    qh, ql = qhi.reshape(-1), qlo.reshape(-1)
    m, q = hi.shape[0], qh.shape[0]

    keys_hi = jnp.concatenate([hi, qh])
    keys_lo = jnp.concatenate([lo, ql])
    tag = jnp.concatenate(
        [jnp.arange(m, dtype=jnp.int32), m + jnp.arange(q, dtype=jnp.int32)]
    )
    shi, slo, stag = lax.sort((keys_hi, keys_lo, tag), num_keys=3)
    return _join_sorted(shi, slo, stag, m, q).reshape(q_shape)


# Bitonic blocks at or below this length are finished with one batched
# lax.sort instead of further (layout-hostile) small-distance stages.
_MERGE_SORT_BLOCK = 2048


def merge_lookup(
    hi: jax.Array, lo: jax.Array, qhi: jax.Array, qlo: jax.Array
) -> jax.Array:
    """Sorted-table lookup of PRE-SORTED queries via one bitonic merge.

    Semantics == :func:`table_lookup_bulk`, but requires ``(qhi, qlo)`` to be
    ascending with sentinels last — which is exactly what rulebook queries
    are: the (already sorted) site table shifted by a constant offset, since
    translation preserves lexicographic order. Merging two sorted runs costs
    log2(n) compare-exchange passes (pure elementwise + reshape, no gathers)
    instead of a full ~log²(n)/2-pass sort: ~7x less data movement at 2cm
    capacities, where rulebook sorts dominated the round-1 eval step
    (BASELINE.md stage split).

    Algorithm: [table asc | sentinel pad | reversed queries desc] is bitonic;
    a classic bitonic merge sorts it in log2(n) stages; the run-detection /
    scatter-back tail is shared with :func:`table_lookup_bulk`.
    """
    q_shape = qhi.shape
    qh, ql = qhi.reshape(-1), qlo.reshape(-1)
    m, q = hi.shape[0], qh.shape[0]
    n = 1 << max(1, math.ceil(math.log2(m + q)))
    pad = n - (m + q)

    khi = jnp.concatenate(
        [hi, jnp.full((pad,), SENTINEL_HI, jnp.uint32), qh[::-1]]
    )
    klo = jnp.concatenate(
        [lo, jnp.full((pad,), SENTINEL_LO, jnp.uint32), ql[::-1]]
    )
    # tags: table < m, queries [m, m+q), padding >= m+q. Padding tags ascend
    # and reversed-query tags descend, so the whole (key, tag) sequence is
    # ascending-then-descending == bitonic.
    tag = jnp.concatenate(
        [
            jnp.arange(m, dtype=jnp.int32),
            m + q + jnp.arange(pad, dtype=jnp.int32),
            (m + jnp.arange(q, dtype=jnp.int32))[::-1],
        ]
    )

    # Hybrid merge. Elementwise compare-exchange stages are only layout-
    # friendly on TPU while the partner distance d keeps the minor reshape
    # dimension large; small-d stages relayout pathologically (measured
    # ~100x off roofline). So: run stages while d >= _MERGE_SORT_BLOCK,
    # which leaves independent bitonic blocks of that length, then finish
    # each block with ONE batched lax.sort along the minor axis (bitonic
    # blocks sort in VMEM; the comparator matches the stage order exactly).
    d = n // 2
    while d >= _MERGE_SORT_BLOCK:
        h = khi.reshape(-1, 2, d)
        l = klo.reshape(-1, 2, d)
        t = tag.reshape(-1, 2, d)
        ah, bh = h[:, 0], h[:, 1]
        al, bl = l[:, 0], l[:, 1]
        at, bt = t[:, 0], t[:, 1]
        # strict total order on (key_hi, key_lo, tag) — tags are distinct
        swap = (ah > bh) | (
            (ah == bh) & ((al > bl) | ((al == bl) & (at > bt)))
        )
        khi = jnp.stack(
            [jnp.where(swap, bh, ah), jnp.where(swap, ah, bh)], axis=1
        ).reshape(n)
        klo = jnp.stack(
            [jnp.where(swap, bl, al), jnp.where(swap, al, bl)], axis=1
        ).reshape(n)
        tag = jnp.stack(
            [jnp.where(swap, bt, at), jnp.where(swap, at, bt)], axis=1
        ).reshape(n)
        d //= 2

    block = min(2 * d, n)  # bitonic block length still unmerged
    if block > 1:
        khi, klo, tag = lax.sort(
            (khi.reshape(-1, block), klo.reshape(-1, block),
             tag.reshape(-1, block)),
            num_keys=3,
        )
        khi, klo, tag = khi.reshape(n), klo.reshape(n), tag.reshape(n)

    return _join_sorted(khi, klo, tag, m, q).reshape(q_shape)


def unique_coords(
    coords: jax.Array,
    valid: jax.Array,
    capacity: int,
    assume_sorted: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Deduplicate coords [N, 3] into a sorted unique table of fixed capacity.

    Returns ``(ucoords [capacity, 3], n_unique, inverse [N], overflow)``:
      * ``ucoords``: sorted unique coordinates; rows >= n_unique hold junk
        (callers must mask by ``arange(capacity) < n_unique``),
      * ``inverse``: for each input row, the index of its unique coord in
        ``ucoords`` (or -1 for invalid input rows / overflow victims),
      * ``overflow``: int32 count of unique coords that did not fit.

    The unique table keeps the *lexicographically smallest* ``capacity``
    coords on overflow (deterministic drop policy — SURVEY.md §7 inv. 1).

    ``assume_sorted`` skips the sort entirely — correct ONLY when the caller
    guarantees lexicographic order with invalid rows last. The one production
    caller is the host-voxelized input path (``train/loop.py``): the C++
    voxelizer emits sorted tables by contract. Downsampled parents are NOT
    sorted (floor-division collapses x values, after which order falls back
    to y — see the NOTE in ``rulebook.downsample_with_rulebooks``); nothing
    here validates sortedness, so a wrong ``assume_sorted=True`` silently
    corrupts the table.
    """
    n = coords.shape[0]
    hi, lo = pack_coords(coords, valid)
    order = jnp.arange(n, dtype=jnp.int32)
    if assume_sorted:
        shi, slo, sorder = hi, lo, order
    else:
        shi, slo, sorder = lexsort_keys(hi, lo, order)
    is_valid_sorted = shi != SENTINEL_HI
    prev_hi = jnp.concatenate([jnp.array([SENTINEL_HI], jnp.uint32), shi[:-1]])
    prev_lo = jnp.concatenate([jnp.array([SENTINEL_LO], jnp.uint32), slo[:-1]])
    is_new = ((shi != prev_hi) | (slo != prev_lo)) & is_valid_sorted
    # rank of each sorted row's unique group
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # [N], -1 only if first row invalid
    n_unique_total = jnp.where(jnp.any(is_new), rank[-1] + 1, 0).astype(jnp.int32)
    n_unique = jnp.minimum(n_unique_total, capacity)
    overflow = n_unique_total - n_unique

    fits = (rank >= 0) & (rank < capacity) & is_valid_sorted
    # scatter the first row of each unique group into the table; non-heads
    # get distinct out-of-bounds slots (capacity + pos) so the index set is
    # duplicate-free (duplicates serialize TPU scatters)
    pos_n = jnp.arange(n, dtype=jnp.int32)
    dst = jnp.where(is_new & fits, rank, capacity + pos_n)
    uhi = jnp.full((capacity,), SENTINEL_HI, jnp.uint32).at[dst].set(
        shi, mode="drop", unique_indices=True)
    ulo = jnp.full((capacity,), SENTINEL_LO, jnp.uint32).at[dst].set(
        slo, mode="drop", unique_indices=True)
    ucoords = unpack_coords(uhi, ulo)

    # inverse map back to original input order
    inv_sorted = jnp.where(fits, rank, -1)
    if assume_sorted:
        inverse = inv_sorted
    else:
        # sorder is a permutation — duplicate-free by construction
        inverse = jnp.zeros((n,), jnp.int32).at[sorder].set(
            inv_sorted, unique_indices=True)
    return ucoords, n_unique, inverse, overflow


def kernel_offsets(kernel_size, centered: bool = True) -> jnp.ndarray:
    """Enumerate the K = kx*ky*kz integer offsets of a conv kernel.

    ``centered=True`` gives offsets in [-(k//2), k - k//2) per axis (odd k →
    symmetric around 0: the submanifold convention). ``centered=False``
    gives [0, k) (the non-overlapping downsample convention, k == stride).
    Returns a *static numpy-backed* int32 array [K, 3] (trace-time constant).
    """
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * 3
    axes = []
    for k in kernel_size:
        if centered:
            axes.append(range(-(k // 2), k - k // 2))
        else:
            axes.append(range(k))
    offs = [(dx, dy, dz) for dx in axes[0] for dy in axes[1] for dz in axes[2]]
    return jnp.array(offs, dtype=jnp.int32)
