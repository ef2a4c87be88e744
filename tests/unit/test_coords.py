import jax.numpy as jnp
import numpy as np

from sparse_rcnn_tpu.ops import coords as C


def random_coords(rng, n, lo=-50, hi=50):
    return rng.integers(lo, hi, size=(n, 3)).astype(np.int32)


def test_pack_unpack_roundtrip(rng):
    c = random_coords(rng, 1000, -30000, 30000)
    hi, lo = C.pack_coords(jnp.asarray(c))
    back = np.asarray(C.unpack_coords(hi, lo))
    np.testing.assert_array_equal(back, c)


def test_pack_order_is_lexicographic(rng):
    c = random_coords(rng, 500)
    hi, lo = np.asarray(C.pack_coords(jnp.asarray(c)))
    lex = [tuple(r) for r in c]
    # pairwise comparison agrees with tuple lexicographic order
    for i in range(0, 400, 37):
        a, b = i, i + 1
        pair_lt = (hi[a], lo[a]) < (hi[b], lo[b])
        lex_lt = lex[a] < lex[b]
        assert pair_lt == lex_lt


def test_table_lookup_hits_and_misses(rng):
    c = np.unique(random_coords(rng, 300), axis=0)
    m = len(c)
    hi, lo = C.pack_coords(jnp.asarray(c))
    shi, slo, = C.lexsort_keys(hi, lo)[:2]
    # every table key must be found at its own position
    idx = np.asarray(C.table_lookup(shi, slo, shi, slo))
    np.testing.assert_array_equal(idx, np.arange(m))
    # misses return -1
    probe = jnp.asarray(np.array([[999, 999, 999], [-999, 0, 0]], np.int32))
    phi, plo = C.pack_coords(probe)
    miss = np.asarray(C.table_lookup(shi, slo, phi, plo))
    np.testing.assert_array_equal(miss, [-1, -1])


def test_unique_coords_matches_numpy(rng):
    base = random_coords(rng, 80, -5, 5)
    dup = np.concatenate([base, base[:40], base[:20]])
    rng.shuffle(dup)
    n = len(dup)
    valid = np.ones(n, bool)
    cap = 512
    uc, nu, inv, ovf = C.unique_coords(jnp.asarray(dup), jnp.asarray(valid), cap)
    uc, nu, inv, ovf = map(np.asarray, (uc, nu, inv, ovf))
    expected = np.unique(dup, axis=0)
    assert nu == len(expected)
    assert ovf == 0
    np.testing.assert_array_equal(uc[:nu], expected)  # sorted unique
    # inverse maps every row back to its own coordinate
    np.testing.assert_array_equal(uc[inv], dup)


def test_unique_coords_respects_validity_and_overflow(rng):
    c = random_coords(rng, 100, -20, 20)
    c = np.unique(c, axis=0)
    n = len(c)
    valid = np.ones(n, bool)
    valid[n // 2:] = False
    cap = 8
    uc, nu, inv, ovf = C.unique_coords(jnp.asarray(c), jnp.asarray(valid), cap)
    nu, ovf, inv = int(nu), int(ovf), np.asarray(inv)
    n_unique_valid = len(np.unique(c[: n // 2], axis=0))
    assert nu == min(cap, n_unique_valid)
    assert ovf == n_unique_valid - nu
    assert (inv[n // 2:] == -1).all()  # invalid rows dropped
    # kept rows are the lexicographically smallest `cap` coords
    kept = np.asarray(uc)[:nu]
    order = np.lexsort((c[: n // 2][:, 2], c[: n // 2][:, 1], c[: n // 2][:, 0]))
    np.testing.assert_array_equal(kept, c[: n // 2][order][:cap])


def test_kernel_offsets():
    offs = np.asarray(C.kernel_offsets(3))
    assert offs.shape == (27, 3)
    assert (offs.min(0) == [-1, -1, -1]).all() and (offs.max(0) == [1, 1, 1]).all()
    offs2 = np.asarray(C.kernel_offsets(2, centered=False))
    assert offs2.shape == (8, 3)
    assert offs2.min() == 0 and offs2.max() == 1


def test_table_lookup_bulk_matches_binary_search(rng):
    import jax
    c = np.unique(random_coords(rng, 400), axis=0)
    m = len(c)
    cap = 512
    pad = np.full((cap, 3), C.COORD_OFFSET - 1, np.int32)
    pad[:m] = c
    mask = np.arange(cap) < m
    hi, lo = C.pack_coords(jnp.asarray(pad), jnp.asarray(mask))
    # queries: mix of hits, misses, and sentinels
    probes = np.concatenate([
        c[:200] + rng.integers(-1, 2, (200, 3)),
        rng.integers(-60, 60, (300, 3)).astype(np.int32),
    ])
    qvalid = np.ones(len(probes), bool)
    qvalid[450:] = False
    qhi, qlo = C.pack_coords(jnp.asarray(probes), jnp.asarray(qvalid))
    a = np.asarray(C.table_lookup(hi, lo, qhi, qlo))
    b = np.asarray(C.table_lookup_bulk(hi, lo, qhi, qlo))
    np.testing.assert_array_equal(a, b)
    # multi-dim query shapes + vmap
    q2 = jnp.stack([qhi.reshape(10, 50)] * 2), jnp.stack([qlo.reshape(10, 50)] * 2)
    bb = jax.vmap(lambda qh, ql: C.table_lookup_bulk(hi, lo, qh, ql))(*q2)
    np.testing.assert_array_equal(np.asarray(bb)[0].ravel(), a)


def test_merge_lookup_matches_bulk(rng):
    """Bitonic-merge lookup == sort-merge lookup on pre-sorted queries."""
    import jax

    # 4096-cap case drives the elementwise bitonic stages (n > sort block);
    # the small cases drive the pure block-sort path.
    for m_cap, n in [(4096, 3000), (256, 200), (96, 96), (128, 1)]:
        c = np.unique(rng.integers(-9, 9, size=(n * 2, 3)).astype(np.int32), axis=0)
        c = c[np.lexsort((c[:, 2], c[:, 1], c[:, 0]))][:n]
        n = len(c)
        pad = np.full((m_cap, 3), C.COORD_OFFSET - 1, np.int32)
        pad[:n] = c
        mask = np.arange(m_cap) < n
        hi, lo = C.pack_coords(jnp.asarray(pad), jnp.asarray(mask))
        # queries: the table shifted by constant offsets (sorted), incl. a
        # shift of zero (all hits) and a large shift (all misses)
        offsets = np.array([[0, 0, 0], [1, 0, -1], [-1, 1, 1], [50, 50, 50]],
                           np.int32)
        q = pad[None] - offsets[:, None]
        qhi, qlo = C.pack_coords(jnp.asarray(q), jnp.asarray(mask)[None])
        want = np.asarray(C.table_lookup_bulk(hi, lo, qhi, qlo))
        got = np.asarray(
            jax.vmap(lambda a, b: C.merge_lookup(hi, lo, a, b))(qhi, qlo)
        )
        np.testing.assert_array_equal(got, want)
        # single (unvmapped) call too
        got1 = np.asarray(C.merge_lookup(hi, lo, qhi[1], qlo[1]))
        np.testing.assert_array_equal(got1, want[1])
