import jax
import jax.numpy as jnp
import numpy as np

from sparse_rcnn_tpu.ops import coords as C
from sparse_rcnn_tpu.ops import rulebook as R
from sparse_rcnn_tpu.sparse import make_sparse_tensor


def sorted_unique_coords(rng, n, lo=-8, hi=8):
    c = np.unique(rng.integers(lo, hi, size=(n, 3)).astype(np.int32), axis=0)
    order = np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
    return c[order]


def pad(c, cap, sentinel=C.COORD_OFFSET - 1):
    out = np.full((cap, 3), sentinel, np.int32)
    out[: len(c)] = c
    return out


def brute_force_subm(coords, n, offsets):
    lut = {tuple(coords[i]): i for i in range(n)}
    idx = np.full((len(offsets), len(coords)), -1, np.int64)
    for k, off in enumerate(offsets):
        for i in range(n):
            q = tuple(coords[i] - off)
            idx[k, i] = lut.get(q, -1)
    return idx


def test_submanifold_rulebook_vs_bruteforce(rng):
    c = sorted_unique_coords(rng, 200)
    n, cap = len(c), 256
    idx = np.asarray(
        R.submanifold_rulebook(jnp.asarray(pad(c, cap)), jnp.int32(n), 3)
    )
    offsets = np.asarray(C.kernel_offsets(3))
    expected = brute_force_subm(pad(c, cap), n, offsets)
    expected[:, n:] = -1
    np.testing.assert_array_equal(idx, expected)


def test_submanifold_rulebook_direct_mode_matches(rng):
    """The "direct" second-half construction (all offsets through one bulk
    lookup, zero scatters) must equal the antisym+transpose default."""
    c = sorted_unique_coords(rng, 200)
    n, cap = len(c), 256
    cpad = jnp.asarray(pad(c, cap))
    base = np.asarray(R.submanifold_rulebook(cpad, jnp.int32(n), 3))
    R.set_subm_second_half("direct")
    try:
        direct = np.asarray(R.submanifold_rulebook(cpad, jnp.int32(n), 3))
    finally:
        R.set_subm_second_half("antisym")
    np.testing.assert_array_equal(direct, base)


def test_submanifold_center_tap_is_identity(rng):
    c = sorted_unique_coords(rng, 100)
    n, cap = len(c), 128
    idx = np.asarray(
        R.submanifold_rulebook(jnp.asarray(pad(c, cap)), jnp.int32(n), 3)
    )
    center = 13  # offset (0,0,0) for k=3
    np.testing.assert_array_equal(idx[center, :n], np.arange(n))
    assert (idx[:, n:] == -1).all()


def test_downsample_and_strided_rulebook(rng):
    c = sorted_unique_coords(rng, 300, -10, 10)
    n, cap = len(c), 512
    cpad = jnp.asarray(pad(c, cap))
    oc, n_out, ovf = R.downsample_sites(cpad, jnp.int32(n), 2, cap)
    oc, n_out = np.asarray(oc), int(n_out)
    expected_sites = np.unique(c // 2, axis=0)
    assert int(ovf) == 0 and n_out == len(expected_sites)
    np.testing.assert_array_equal(oc[:n_out], expected_sites)

    idx = np.asarray(
        R.strided_rulebook(cpad, jnp.int32(n), jnp.asarray(oc), jnp.int32(n_out), 2)
    )
    lut = {tuple(r): i for i, r in enumerate(c)}
    offsets = np.asarray(C.kernel_offsets(2, centered=False))
    for k, off in enumerate(offsets):
        for o in range(n_out):
            q = tuple(oc[o] * 2 + off)
            assert idx[k, o] == lut.get(q, -1)
    assert (idx[:, n_out:] == -1).all()
    # every fine site feeds exactly one (k, o) slot
    flat = idx[:, :n_out].ravel()
    used = flat[flat >= 0]
    assert len(used) == n  # all inputs covered
    assert len(np.unique(used)) == n


def test_inverse_rulebook_pairs_with_strided(rng):
    c = sorted_unique_coords(rng, 250, -10, 10)
    n, cap = len(c), 512
    cpad = jnp.asarray(pad(c, cap))
    oc, n_out, _ = R.downsample_sites(cpad, jnp.int32(n), 2, cap)
    inv = np.asarray(
        R.inverse_rulebook(jnp.asarray(oc), n_out, cpad, jnp.int32(n), 2)
    )
    oc = np.asarray(oc)
    lut = {tuple(r): i for i, r in enumerate(oc[: int(n_out)])}
    offsets = np.asarray(C.kernel_offsets(2, centered=False))
    for i in range(n):
        parent = c[i] // 2
        child = tuple(c[i] - parent * 2)
        k = [tuple(o) for o in offsets].index(child)
        for kk in range(8):
            if kk == k:
                assert inv[kk, i] == lut[tuple(parent)]
            else:
                assert inv[kk, i] == -1
    assert (inv[:, n:] == -1).all()


def test_transpose_rulebook_roundtrip(rng):
    c = sorted_unique_coords(rng, 150)
    n, cap = len(c), 256
    idx = np.asarray(
        R.submanifold_rulebook(jnp.asarray(pad(c, cap)), jnp.int32(n), 3)
    )
    t = np.asarray(R.transpose_rulebook(jnp.asarray(idx), cap))
    k_taps = idx.shape[0]
    for k in range(k_taps):
        for i in range(cap):
            j = idx[k, i]
            if j >= 0:
                assert t[k, j] == i
        # and nothing spurious
        for j in range(cap):
            if t[k, j] >= 0:
                assert idx[k, t[k, j]] == j


def test_make_sparse_tensor_sorts(rng):
    c = sorted_unique_coords(rng, 60)
    perm = rng.permutation(len(c))
    cap = 64
    coords = jnp.asarray(pad(c[perm], cap))[None]
    feats = jnp.asarray(
        np.pad(perm.astype(np.float32)[:, None], ((0, cap - len(c)), (0, 0)))
    )[None]
    st = make_sparse_tensor(coords, feats, jnp.asarray([len(c)], jnp.int32))
    got_c = np.asarray(st.coords[0, : len(c)])
    np.testing.assert_array_equal(got_c, c)
    got_f = np.asarray(st.feats[0, : len(c), 0]).astype(int)
    # feature rows followed their coordinates through the sort: pre-sort row j
    # holds value perm[j] and coord c[perm[j]], so sorted row i (coord c[i])
    # must hold value i.
    np.testing.assert_array_equal(got_f, np.arange(len(c)))


def test_downsample_with_rulebooks_matches_oracles(rng):
    """Fused inverse-map path == (downsample_sites, strided, inverse) oracles."""
    for coarse_cap in [512, 64]:  # 64 forces coarse-capacity overflow
        c = sorted_unique_coords(rng, 300, -12, 12)
        n, cap = len(c), 512
        cpad = jnp.asarray(pad(c, cap))
        nv = jnp.int32(n)
        oc, n_out, ovf, down, up = R.downsample_with_rulebooks(
            cpad, nv, 2, coarse_cap
        )
        oc_o, n_out_o, ovf_o = R.downsample_sites(cpad, nv, 2, coarse_cap)
        np.testing.assert_array_equal(np.asarray(oc), np.asarray(oc_o))
        assert int(n_out) == int(n_out_o) and int(ovf) == int(ovf_o)
        down_o = R.strided_rulebook(cpad, nv, oc_o, n_out_o, 2)
        up_o = R.inverse_rulebook(oc_o, n_out_o, cpad, nv, 2)
        np.testing.assert_array_equal(np.asarray(down), np.asarray(down_o))
        np.testing.assert_array_equal(np.asarray(up), np.asarray(up_o))
