"""Sparse convolution executor: per-offset gather → MXU matmul → accumulate.

The reference executes sparse conv as native gather-GEMM-scatter with a
custom autograd backward (SURVEY.md C4/N3; reference tree empty at survey,
§0). TPU-native recast (BASELINE north-star): with the dense gather-form
rulebook (``neighbor_idx[K, M_out]``, see :mod:`.rulebook`) the forward pass
needs **no scatter at all** — for each kernel tap ``k``:

    out += (feats[idx[k]] masked) @ W[k]

which is exactly a blocked gather feeding the 128x128 MXU. The backward
pass reuses the *transposed* rulebook so grads w.r.t. the input features are
also pure gathers (scatter-free, deterministic):

    d_feats[j] = sum_k g[t_idx[k, j]] @ W[k]^T
    d_W[k]     = feats^T @ (g[t_idx[k]] masked)   (same gathered array!)

Two implementations:
  * :func:`gather_matmul_conv` — straight-line XLA (lax.scan over taps);
    differentiable by autodiff (scatter-add backward). The parity oracle.
  * :func:`sparse_conv` — custom-VJP wrapper whose backward is the
    gather-form above (SURVEY.md §7 invariant 4). The default.

A fused Pallas kernel lives in :mod:`.pallas_conv`; both must stay
numerically interchangeable (tests/parity).

Shapes: feats [B, M_in, Cin], idx int32[B, K, M_out], weights [K, Cin, Cout]
→ out [B, M_out, Cout]. Accumulation is float32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from . import rulebook as rb


def _gather_rows(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """feats [M, C], idx int32[N] (-1 = missing) → [N, C] with zeros for -1."""
    safe = jnp.clip(idx, 0, feats.shape[0] - 1)
    g = feats[safe]
    return g * (idx >= 0)[:, None].astype(g.dtype)


from .batching import map_scenes as _unroll_scenes  # noqa: E402 (policy: ops/batching.py)


def gather_matmul_conv(
    feats: jax.Array, idx: jax.Array, weights: jax.Array
) -> jax.Array:
    """Reference XLA executor (autodiff-able end to end): scan over taps."""
    out_dtype = jnp.promote_types(feats.dtype, weights.dtype)

    def per_scene(f, ix):
        m_out = ix.shape[1]
        init = jnp.zeros((m_out, weights.shape[-1]), jnp.float32)

        def step(acc, kw):
            ix_k, w_k = kw
            g = _gather_rows(f, ix_k)
            return acc + jnp.dot(g, w_k, preferred_element_type=jnp.float32), None

        acc, _ = lax.scan(step, init, (ix, weights))
        return acc

    out = _unroll_scenes(per_scene, feats, idx)
    return out.astype(out_dtype)


# The im2col executor materializes a [M_out, K*Cin] buffer per scene. Gate
# on BYTES, not columns: at config-2 scale (M=262144, K*Cin=864, f32) the
# buffer is ~906 MB/layer — it must fall back to the blocked executor, which
# processes row tiles under lax.map and never exceeds _BLOCK_ROWS rows.
_IM2COL_MAX_BYTES = 96 * 1024 * 1024
_BLOCK_ROWS = 8192


def _im2col_bytes(m_out: int, k: int, cin: int, dtype) -> int:
    return m_out * k * cin * jnp.dtype(dtype).itemsize


def concat_matmul_conv(
    feats: jax.Array, idx: jax.Array, weights: jax.Array
) -> jax.Array:
    """Im2col executor: ONE MXU matmul per layer instead of K small ones.

    Gathers all taps into G [B, M_out, K*Cin] and contracts with
    W.reshape(K*Cin, Cout). For the small channel counts of sparse UNets
    (Cin 16–96) the per-tap matmuls use a sliver of the 128x128 MXU; the
    concatenated contraction saturates it. Numerics match
    :func:`gather_matmul_conv` up to f32 summation order.
    """
    out_dtype = jnp.promote_types(feats.dtype, weights.dtype)
    k, cin, cout = weights.shape

    def per_scene(f, ix):
        m_out = ix.shape[1]
        safe = jnp.clip(ix, 0, f.shape[0] - 1)          # [K, M_out]
        g = f[safe]                                      # [K, M_out, Cin]
        g = g * (ix >= 0)[..., None].astype(g.dtype)
        g = jnp.swapaxes(g, 0, 1).reshape(m_out, k * cin)
        return jnp.dot(
            g, weights.reshape(k * cin, cout).astype(g.dtype),
            preferred_element_type=jnp.float32,
        )

    out = _unroll_scenes(per_scene, feats, idx)
    return out.astype(out_dtype)


def blocked_matmul_conv(
    feats: jax.Array, idx: jax.Array, weights: jax.Array,
    use_pallas: bool = False, block: int = 0,
) -> jax.Array:
    """Row-blocked im2col: bounded memory at any M_out (the 2cm-scale path).

    Processes M_out in tiles of ``block`` rows under ``lax.map``; each tile
    gathers [K, block, Cin] and contracts it on the MXU — so peak transient
    memory is O(block·K·Cin) instead of O(M_out·K·Cin). With ``use_pallas``
    the contraction is the fused tap-accumulate kernel
    (:func:`.pallas_conv.tap_accumulate_matmul`), which also skips the
    [block, K·Cin] transpose the XLA im2col needs.
    """
    out_dtype = jnp.promote_types(feats.dtype, weights.dtype)
    k, cin, cout = weights.shape
    block = block or _BLOCK_ROWS
    if use_pallas:
        from . import pallas_conv as pc

        interpret = jax.default_backend() != "tpu"

    def per_scene(f, ix):
        m_out = ix.shape[1]
        b = min(block, m_out)
        nt = -(-m_out // b)
        pad = nt * b - m_out
        ixp = jnp.pad(ix, ((0, 0), (0, pad)), constant_values=-1)
        tiles = jnp.swapaxes(ixp.reshape(k, nt, b), 0, 1)   # [nt, K, b]
        w = weights.astype(f.dtype)

        def tile_fn(ix_t):
            safe = jnp.clip(ix_t, 0, f.shape[0] - 1)
            g = f[safe] * (ix_t >= 0)[..., None].astype(f.dtype)  # [K, b, Cin]
            if use_pallas:
                return pc.tap_accumulate_matmul(g, w, interpret=interpret)
            g2 = jnp.swapaxes(g, 0, 1).reshape(b, k * cin)
            return jnp.dot(
                g2, w.reshape(k * cin, cout),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)

        out = lax.map(tile_fn, tiles)                        # [nt, b, Cout]
        return out.reshape(nt * b, cout)[:m_out]

    return _unroll_scenes(per_scene, feats, idx).astype(out_dtype)


# ---------------------------------------------------------------------------
# Pencil executor: exploit z-adjacency of the sorted table (round-3 headline)
#
# The coordinate table is lexicographically sorted with z innermost, and the
# submanifold offset enumeration is z-innermost too. Consequence: for a
# fixed (dx, dy), the kz z-taps of one output site query keys that differ
# only by adjacent z values — and in a sorted UNIQUE table, rows holding any
# subset of adjacent keys are CONSECUTIVE (no key fits between them). So the
# kz taps of each "pencil" can be fetched with ONE row gather from a
# shifted-concat table f3[i] = [f[i], f[i+1], ..., f[i+kz-1]], then routed
# to their tap columns with elementwise selects:
#
#   pencil base row r = first present tap's row,
#   tap t's chunk slot = number of present taps before t (cumsum of flags).
#
# A 27-tap conv thus needs 9 wide gathers instead of 27 narrow ones — and
# the gather study (benchmarks/gather_study.py) measured XLA's gather cost
# as per-ROW, not per-byte: 192-byte pencil rows move ~2.5x more useful
# bytes/sec than 64-byte tap rows on v5e. The center pencil needs no gather
# at all when the center tap is the identity (submanifold + its transpose):
# its base row is i-1 or i, a select of two static slices.
#
# VALIDITY: requires idx to be a rulebook over sorted unique tables with a
# z-innermost-ascending tap enumeration (true for submanifold rulebooks and
# their transposes; asserted by tests/parity against the scan executor).
# An arbitrary idx with K=27 does NOT qualify — hence pencil never runs for
# caller-constructed index arrays outside the conv layers.
# ---------------------------------------------------------------------------

# Pencil chunk row cap: 192B (bf16 C<=32). Measured on the chip: 192B
# pencil rows gather at ~3.5 ms/M rows (fast regime), 384B rows fall off a
# cliff (~12 ms/M) — so at C=64 bf16 the plain per-tap 128B gathers win.
# The CHANNEL-SLICED variant (2 gathers/pencil of 192B each, sharing one
# anchor — 18·M rows vs blocked's 27·M) was built and MEASURED SLOWER:
# 55.3 ms vs blocked 21.4 at C=64/219k sites — two same-index gathers do
# not price like one (XLA commons the shared index into wider effective
# rows and doubles the chunk-table assembly traffic). The implementation
# stays (any cin works when calling pencil_matmul_conv directly; parity-
# tested), but auto only ever picks single-slice pencils.
_PENCIL_MAX_ROW_BYTES = 192


def _pencil_slice_bounds(cin: int, dtype):
    """Partition [0, cin) into the fewest near-even slices whose 3-tap
    chunk rows fit the pencil byte cap."""
    max_c = max(1, _PENCIL_MAX_ROW_BYTES // (3 * jnp.dtype(dtype).itemsize))
    n = -(-cin // max_c)
    base, rem = divmod(cin, n)
    bounds, lo = [], 0
    for i in range(n):
        hi = lo + base + (1 if i < rem else 0)
        bounds.append((lo, hi))
        lo = hi
    return bounds


def _pencil_ok(k: int, cin: int, dtype) -> bool:
    if k != 27:  # static-slot extraction is derived for kz == 3
        return False
    # single slice only: the 2-slice variant measured 2.6x SLOWER than the
    # blocked executor at C=64 (see the cap comment above)
    return len(_pencil_slice_bounds(cin, dtype)) == 1


def _pencil_cat(f: jax.Array, kz: int) -> jax.Array:
    """[M, C] → [M, kz*C]: row i holds rows i..i+kz-1 (zero-padded tail)."""
    m, c = f.shape
    fpad = jnp.concatenate([f, jnp.zeros((kz - 1, c), f.dtype)], axis=0)
    return jnp.concatenate([fpad[i:m + i] for i in range(kz)], axis=1)


def _pencil_tables(f, bounds, m):
    """Per-slice extended chunk tables + their center (identity) slices.

    Table s is ``_pencil_cat`` of feature columns ``bounds[s]`` with two
    zero rows prepended: row j holds feats rows (j-2, j-1, j), so a chunk
    anchored at row ``a`` (legitimately -1 or -2 at the table's low edge)
    lives at index a+2 ≥ 0 — no clip shift. The center slice (anchor i-1)
    is a contiguous view, no gather."""
    f3es, centers = [], []
    for lo, hi in bounds:
        fz = jnp.concatenate(
            [jnp.zeros((2, hi - lo), f.dtype), f[:, lo:hi]], axis=0)
        f3e = _pencil_cat(fz, 3)
        f3es.append(f3e)
        centers.append(f3e[1:m + 1])
    return f3es, centers


def _pencil3_chunks(f3es, ix_t, widths, center_slices=None):
    """Per-pencil STATIC-slot chunk extraction for kz == 3.

    Anchoring the gather at (middle-tap row - 1) whenever the middle (z)
    tap is present makes chunk slots static — slot s holds the z-1+s key's
    row — with exactly ONE rare-case select per pencil: when z is absent
    but both z-1 and z+1 present, the z+1 row compresses into slot 1.

    Rulebook convention: idx[k, i] = row of coords[i] - offset_k, so the
    tap with dz offset j-1 (j = position in the triple) queries key
    z-(j-1): within each triple, tap 3p+2 holds the z-1 key's row, 3p+1
    the z key's, 3p the z+1 key's.

    ``f3es``/``widths``: per-channel-slice extended chunk tables (see
    :func:`_pencil_tables`) and their channel widths; the anchor is
    computed once per pencil and each slice costs one gather.

    Yields per pencil: (list of masked [b, 3*c_s] blocks in slot order
    z-1,z,z+1, tap indices (3p+2, 3p+1, 3p) matching those slots).
    """
    k, b = ix_t.shape
    me = f3es[0].shape[0]
    n_pencils = k // 3
    for p in range(n_pencils):
        t0 = ix_t[3 * p + 2]      # row of key z-1 (or -1)
        t1 = ix_t[3 * p + 1]      # row of key z
        t2 = ix_t[3 * p]          # row of key z+1
        pm, p0, pp = t0 >= 0, t1 >= 0, t2 >= 0
        if center_slices is not None and p == n_pencils // 2:
            # identity center tap: the anchor is ALWAYS i-1 (row i-1 holds
            # the z-1 key iff present; i+1 the z+1 key iff present) — a
            # contiguous slice, no gather, no select
            srcs = center_slices
            fix = jnp.zeros_like(pm)  # (z present on every live row)
        else:
            # anchor: rows (a, a+1, a+2) hold keys (z-1, z, z+1) when the
            # corresponding tap is present — adjacent keys occupy adjacent
            # rows in the sorted unique table
            a = jnp.where(p0, t1 - 1, jnp.where(pm, t0, t2 - 2))
            ga = jnp.clip(a + 2, 0, me - 1)
            srcs = [f3e[ga] for f3e in f3es]         # THE gathers (1/slice)
            fix = pm & ~p0 & pp   # z+1 compressed into slot 1
        blks = []
        for g3, c in zip(srcs, widths):
            c0 = g3[:, :c]
            c1 = g3[:, c:2 * c]
            c2 = jnp.where(fix[:, None], c1, g3[:, 2 * c:])
            blks.append(jnp.concatenate([
                c0 * pm[:, None].astype(c0.dtype),
                c1 * p0[:, None].astype(c1.dtype),
                c2 * pp[:, None].astype(c2.dtype),
            ], axis=1))
        yield blks, (3 * p + 2, 3 * p + 1, 3 * p)


def pencil_matmul_conv(
    feats: jax.Array, idx: jax.Array, weights: jax.Array,
    center_identity: bool = True,
) -> jax.Array:
    """Flat (untiled) pencil executor (see the block comment above), K==27.

    Each pencil contributes one [M, 3c_s] @ [3c_s, Cout] matmul per channel
    slice whose left operand is the statically-slotted masked chunk block —
    no im2col, one select per pencil, (8 × n_slices) wide gathers + slices
    per conv. Untiled on purpose: the per-pencil transient is only
    [M, 3c_s] (~50 MB at 2cm C=32), and tiling was measured 35% slower
    (256 small gathers + lax.map overhead). Semantically identical to
    :func:`gather_matmul_conv` for rulebooks that satisfy the pencil
    validity conditions (tests/parity). ``center_identity`` may only be
    True when output row i IS input row i (submanifold and its transpose) —
    the center pencil is then a slice.
    """
    out_dtype = jnp.promote_types(feats.dtype, weights.dtype)
    k, cin, cout = weights.shape
    assert k == 27, (k, "pencil executor supports 3x3x3 kernels")
    bounds = _pencil_slice_bounds(cin, feats.dtype)
    widths = [hi - lo for lo, hi in bounds]

    def per_scene(f, ix):
        m = ix.shape[1]
        f3es, centers = _pencil_tables(f, bounds, m)
        cs = centers if center_identity else None
        w = weights.astype(f.dtype)
        acc = jnp.zeros((m, cout), jnp.float32)
        for blks, taps in _pencil3_chunks(f3es, ix, widths, cs):
            for blk, (lo, hi) in zip(blks, bounds):
                wp = jnp.concatenate(
                    [w[t, lo:hi] for t in taps], axis=0)     # [3c_s, Cout]
                acc = acc + jnp.dot(
                    blk, wp, preferred_element_type=jnp.float32)
        return acc

    return _unroll_scenes(per_scene, feats, idx).astype(out_dtype)


# Executor selection: "auto" picks the pencil executor for odd cubic
# kernels within the pencil row-byte cap, the im2col executor for small
# gather buffers, and the row-blocked executor above the byte budget;
# "pallas" forces the Pallas tap-accumulate contraction at any size.
_EXECUTOR_MODE = "auto"


def set_executor_mode(mode: str) -> None:
    """Select the conv executor globally:
    auto | concat | scan | pallas | blocked | pencil | no_pencil.

    Takes effect at trace time (call before jit-compiling steps).
    ``no_pencil`` = auto minus the pencil fast path (A/B baseline).
    """
    global _EXECUTOR_MODE
    assert mode in ("auto", "concat", "scan", "pallas", "blocked",
                    "pencil", "no_pencil"), mode
    _EXECUTOR_MODE = mode


def _best_executor(k: int, cin: int, m_out: int, dtype, auto_pencil=True):
    if _EXECUTOR_MODE == "scan":
        return gather_matmul_conv
    if _EXECUTOR_MODE == "concat":
        return concat_matmul_conv
    if _EXECUTOR_MODE == "blocked":
        return blocked_matmul_conv
    if _EXECUTOR_MODE == "pallas":
        import functools

        return functools.partial(blocked_matmul_conv, use_pallas=True)
    if _EXECUTOR_MODE == "pencil" and _pencil_ok(k, cin, dtype):
        return pencil_matmul_conv  # non-qualifying K falls through to auto
    # auto: the flat pencil executor wherever its validity conditions hold
    # (sparse_conv's odd-cubic-K contract is submanifold rulebooks) and the
    # chunk row stays in the fast gather regime — measured 15.7 vs 19.7 ms
    # per 262k-row C=32 bf16 conv vs the blocked executor on v5e.
    if (auto_pencil and _EXECUTOR_MODE != "no_pencil"
            and _pencil_ok(k, cin, dtype)):
        return pencil_matmul_conv
    if _im2col_bytes(m_out, k, cin, dtype) <= _IM2COL_MAX_BYTES:
        return concat_matmul_conv
    return blocked_matmul_conv


def _pick(feats, idx, weights):
    return _best_executor(
        weights.shape[0], weights.shape[1], idx.shape[-1], feats.dtype
    )


# ---------------------------------------------------------------------------
# Shared-gather backward (round 3): ONE sweep of the cotangent produces BOTH
# gradients. Per tap, with t_idx[k] the per-tap transpose of idx[k]
# (t_idx[k, j] = i iff idx[k, i] = j — exactly what transpose_rulebook and
# the rulebook dualities supply, tap-aligned with W[k]):
#
#   d_f[j] = Σ_k G_k[j] @ W[k]^T        G_k = masked_gather(g, t_idx[k])
#   d_W[k] = Σ_i f[idx_k[i]] g[i]^T     (reindex i → j = idx_k[i], injective)
#          = Σ_j f[j] G_k[j]^T  =  f^T @ G_k
#
# so d_W's separate re-gather of `feats` (another K·M rows) is eliminated:
# the SAME gathered cotangent feeds both contractions. Backward gather
# traffic halves vs the two-sweep formulation — and these convs are
# gather-bound, not FLOP-bound (BASELINE.md). Masking: missing pairs and
# padding rows have t_idx = -1 → zero rows in G_k; `feats` padding rows may
# be nonzero (post-BN) but only ever pair with those zero G_k rows.
# ---------------------------------------------------------------------------

# Auto-mode gate for the pencil executor INSIDE the shared backward.
# DECIDED by the round-3 on-chip A/B (_chiplogs/spb0/spb1, 2026-08-18):
# 2cm train step 1574 ms/scene (off) vs 1565 ms (on) — a wash, within run
# noise — so the default stays OFF for lower peak HBM (the pencil branch
# builds flat [M,3C] tables; the shared form no longer OOMs like the old
# two-sweep variant at 18.6 G vs 15.75 G HBM, but same-speed means the
# transients buy nothing). Do NOT re-run this experiment; flip via
# set_shared_pencil_bwd only if the backward's gather mix changes.
_SHARED_PENCIL_BWD = False


def set_shared_pencil_bwd(on: bool) -> None:
    """Enable/disable the pencil fast path inside the shared backward
    (auto mode only; explicit ``pencil`` mode always uses it). Trace-time."""
    global _SHARED_PENCIL_BWD
    _SHARED_PENCIL_BWD = bool(on)


def _bwd_shared(feats, t_idx, weights, g):
    """Fused backward: returns ``(d_f, d_W[f32])``.

    ``t_idx`` must be tap-aligned per-tap transposes of the forward
    rulebook (see block comment above). For odd cubic K the triples arrive
    z-ASCENDING (both transpose_rulebook output and the flip-enumeration
    duality t(subm) = subm[:, ::-1]); the pencil branch flips taps and
    weights jointly back to the canonical z-descending convention
    (numerically an identity permutation of the sum) and un-flips d_W.

    Everything gathers in the compute dtype (bf16 row gathers are 4x
    faster than f32 on v5e) and accumulates in f32 on the MXU.
    """
    k, cin, cout = weights.shape
    m_in = feats.shape[-2]
    m_out = g.shape[-2]
    w_t = jnp.swapaxes(weights, -1, -2).astype(g.dtype)     # [K, Cout, Cin]
    mode = _EXECUTOR_MODE

    use_pencil = (
        _pencil_ok(k, cout, g.dtype) and m_in == m_out
        and (mode == "pencil" or (mode == "auto" and _SHARED_PENCIL_BWD))
    )
    if use_pencil:
        # canonical z-descending convention for the pencil executor
        ti = jnp.flip(t_idx, axis=-2)
        wt = jnp.flip(w_t, axis=0)
        bounds = _pencil_slice_bounds(cout, g.dtype)        # single slice
        widths = [hi - lo for lo, hi in bounds]

        def scene(f, tix, gb):
            f3es, centers = _pencil_tables(gb, bounds, m_in)
            acc = jnp.zeros((m_in, cin), jnp.float32)
            parts = [None] * k
            for blks, taps in _pencil3_chunks(f3es, tix, widths, centers):
                blk = blks[0]                               # [M, 3*Cout]
                wp = jnp.concatenate([wt[t] for t in taps], axis=0)
                acc = acc + jnp.dot(
                    blk, wp, preferred_element_type=jnp.float32)
                dwp = jnp.dot(                              # d_W: f^T @ G
                    f.T, blk, preferred_element_type=jnp.float32,
                ).reshape(cin, 3, cout)
                for s, t in enumerate(taps):
                    parts[t] = dwp[:, s]
            return acc, jnp.stack(parts)                    # dw flipped enum

        d_f, dw = _unroll_scenes(scene, feats, ti, g)
        return d_f, jnp.flip(dw.sum(axis=0), axis=0)

    if mode == "scan":
        def scene(f, tix, gb):
            def step(acc, kw):
                tix_k, wt_k = kw
                G = _gather_rows(gb, tix_k)                 # [M_in, Cout]
                d = jnp.dot(G, wt_k, preferred_element_type=jnp.float32)
                dw_k = jnp.dot(
                    f.T, G, preferred_element_type=jnp.float32)
                return acc + d, dw_k
            acc, dw = lax.scan(
                step, jnp.zeros((m_in, cin), jnp.float32), (tix, w_t))
            return acc, dw

        d_f, dw = _unroll_scenes(scene, feats, t_idx, g)
        return d_f, dw.sum(axis=0)

    if mode == "concat" or (
        mode in ("auto", "no_pencil")
        and _im2col_bytes(m_in, k, cout, g.dtype) <= _IM2COL_MAX_BYTES
    ):
        def scene(f, tix, gb):
            safe = jnp.clip(tix, 0, gb.shape[0] - 1)
            G = gb[safe] * (tix >= 0)[..., None].astype(gb.dtype)
            Gc = jnp.swapaxes(G, 0, 1).reshape(m_in, k * cout)
            d = jnp.dot(
                Gc, w_t.reshape(k * cout, cin),
                preferred_element_type=jnp.float32)
            dw = jnp.dot(                                   # [Cin, K*Cout]
                f.T, Gc, preferred_element_type=jnp.float32,
            ).reshape(cin, k, cout)
            return d, jnp.swapaxes(dw, 0, 1)

        d_f, dw = _unroll_scenes(scene, feats, t_idx, g)
        return d_f, dw.sum(axis=0)

    # row-blocked shared backward: bounded transients at any M
    use_pallas = mode == "pallas"
    if use_pallas:
        from . import pallas_conv as pc

        interpret = jax.default_backend() != "tpu"

    def scene(f, tix, gb):
        b = min(_BLOCK_ROWS, m_in)
        nt = -(-m_in // b)
        pad = nt * b - m_in
        tp = jnp.pad(tix, ((0, 0), (0, pad)), constant_values=-1)
        fp = jnp.pad(f, ((0, pad), (0, 0)))
        tiles_ix = jnp.swapaxes(tp.reshape(k, nt, b), 0, 1)  # [nt, K, b]
        tiles_f = fp.reshape(nt, b, cin)

        def step(dw_acc, t):
            tix_t, f_t = t
            safe = jnp.clip(tix_t, 0, gb.shape[0] - 1)
            G = gb[safe] * (tix_t >= 0)[..., None].astype(gb.dtype)
            if use_pallas:
                d = pc.tap_accumulate_matmul(G, w_t, interpret=interpret)
            else:
                g2 = jnp.swapaxes(G, 0, 1).reshape(b, k * cout)
                d = jnp.dot(
                    g2, w_t.reshape(k * cout, cin),
                    preferred_element_type=jnp.float32)
            dw_acc = dw_acc + jnp.einsum(
                "bc,kbd->kcd", f_t, G,
                preferred_element_type=jnp.float32)
            # stack d_f tiles in the COMPUTE dtype: f32 tiles double the
            # [M, Cin] d_f transient on the HBM-bound 2cm path, and the
            # caller casts d_f to feats.dtype anyway
            return dw_acc, d.astype(gb.dtype)

        dw, d_tiles = lax.scan(
            step, jnp.zeros((k, cin, cout), jnp.float32),
            (tiles_ix, tiles_f))
        return d_tiles.reshape(nt * b, cin)[:m_in], dw

    d_f, dw = _unroll_scenes(scene, feats, t_idx, g)
    return d_f, dw.sum(axis=0)


@jax.custom_vjp
def sparse_conv(feats: jax.Array, idx: jax.Array, weights: jax.Array) -> jax.Array:
    """Sparse conv with gather-form (scatter-free) backward. Default executor.

    Executor choice ("auto"): the pencil executor for odd cubic kernels
    within the pencil row-byte cap, else im2col when the gather buffer fits
    the byte budget, else row-blocked.

    CONTRACT for odd cubic K (27, 125, ...): ``idx`` must be a submanifold
    rulebook (or its transpose) over sorted unique tables — z-innermost
    ascending tap enumeration, identity center tap. The pencil fast path
    relies on the z-adjacency those rulebooks guarantee; arbitrary index
    arrays with such K must use the oracle executors directly.
    """
    return _pick(feats, idx, weights)(feats, idx, weights)


def _fwd(feats, idx, weights):
    return sparse_conv(feats, idx, weights), (feats, idx, weights)


def _bwd(res, g):
    feats, idx, weights = res
    m_in = feats.shape[1]
    # Gather the cotangent in the COMPUTE dtype: the shared backward is
    # gather-bound and f32 row gathers run 4x slower than bf16 on v5e
    # (BASELINE.md). Accumulation inside is f32 regardless
    # (preferred_element_type), so only the cotangent rounds to bf16 —
    # standard mixed-precision backward semantics.
    g = g.astype(feats.dtype)
    # d_feats AND d_W from one gather sweep via the transposed rulebook
    # (pure gather, no scatter) — see _bwd_shared.
    t_idx = _unroll_scenes(lambda ix: rb.transpose_rulebook(ix, m_in), idx)
    d_f, d_w = _bwd_shared(feats, t_idx, weights, g)
    return d_f.astype(feats.dtype), None, d_w.astype(weights.dtype)


sparse_conv.defvjp(_fwd, _bwd)


@jax.custom_vjp
def sparse_conv_t(
    feats: jax.Array, idx: jax.Array, t_idx: jax.Array, weights: jax.Array
) -> jax.Array:
    """Sparse conv with a caller-supplied transposed rulebook.

    The transposes come for free from rulebook dualities — no scatters in
    the backward at all:
      * submanifold (odd centered kernel): t(idx) == idx[:, ::-1, :]
        (reversing the offset enumeration negates every offset),
      * strided down (k==s):               t(down_idx) == up_idx,
      * inverse up (k==s):                 t(up_idx) == down_idx.

    For odd cubic K the flip-enumeration t_idx convention above is REQUIRED
    (the backward flips it back to canonical z-ascending order for the
    pencil executor — a joint tap permutation, numerically identity).
    """
    return _pick(feats, idx, weights)(feats, idx, weights)


def _fwd_t(feats, idx, t_idx, weights):
    return sparse_conv_t(feats, idx, t_idx, weights), (feats, idx, t_idx, weights)


def _bwd_t(res, g):
    feats, idx, t_idx, weights = res
    g = g.astype(feats.dtype)  # bf16 gathers — see _bwd
    # The duality-supplied t_idx is tap-aligned with W (t_idx[k] is the
    # per-tap transpose of idx[k]; for odd cubic K that's the
    # flip-enumeration t(subm) == idx[:, ::-1], z-ascending triples —
    # _bwd_shared's pencil branch re-flips to canonical order).
    d_f, d_w = _bwd_shared(feats, t_idx, weights, g)
    return d_f.astype(feats.dtype), None, None, d_w.astype(weights.dtype)


sparse_conv_t.defvjp(_fwd_t, _bwd_t)
