"""Dense-conv oracle parity: the canonical correctness check (SURVEY.md §4).

Scatter the sparse voxels into a dense grid, run `lax.conv_general_dilated`,
and compare at active sites. Also: custom-VJP grads vs plain autodiff.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_rcnn_tpu.ops import coords as C
from sparse_rcnn_tpu.ops import rulebook as R
from sparse_rcnn_tpu.ops import sparse_conv as SC


def setup_scene(rng, n=150, cin=5, lo=0, hi=9):
    c = np.unique(rng.integers(lo, hi, size=(n, 3)).astype(np.int32), axis=0)
    order = np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
    c = c[order]
    f = rng.normal(size=(len(c), cin)).astype(np.float32)
    return c, f


def pad_rows(arr, cap, fill):
    out = np.full((cap,) + arr.shape[1:], fill, arr.dtype)
    out[: len(arr)] = arr
    return out


def densify(c, f, size, cin):
    grid = np.zeros((size, size, size, cin), np.float32)
    grid[c[:, 0], c[:, 1], c[:, 2]] = f
    return grid


def dense_kernel_from_taps(weights, offsets, k):
    """Map per-tap weights W[tap(delta)] to a dense cross-corr kernel w[q]:
    out[p] = sum_delta in[p - delta] W[tap] = sum_q in[p - k//2 + q] w[q]
    with q = k//2 - delta."""
    cin, cout = weights.shape[1], weights.shape[2]
    dk = np.zeros((k, k, k, cin, cout), np.float32)
    for tap, d in enumerate(offsets):
        q = (k // 2) - d
        dk[q[0], q[1], q[2]] = weights[tap]
    return dk


def run_dense(grid, dk, stride=1):
    out = jax.lax.conv_general_dilated(
        jnp.asarray(grid)[None],
        jnp.asarray(dk),
        window_strides=(stride,) * 3,
        padding="SAME" if stride == 1 else "VALID",
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
    )
    return np.asarray(out)[0]


def test_submanifold_conv_matches_dense(rng):
    cin, cout, cap = 5, 7, 256
    c, f = setup_scene(rng, cin=cin)
    n = len(c)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2
    idx = R.submanifold_rulebook(
        jnp.asarray(pad_rows(c, cap, C.COORD_OFFSET - 1)), jnp.int32(n), 3
    )
    out = np.asarray(
        SC.sparse_conv(
            jnp.asarray(pad_rows(f, cap, 0.0))[None], idx[None], jnp.asarray(w)
        )
    )[0]
    offsets = np.asarray(C.kernel_offsets(3))
    dense = run_dense(densify(c, f, 12, cin), dense_kernel_from_taps(w, offsets, 3))
    expected = dense[c[:, 0], c[:, 1], c[:, 2]]
    np.testing.assert_allclose(out[:n], expected, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out[n:], 0.0, atol=1e-6)


def test_strided_conv_matches_dense(rng):
    cin, cout, cap = 4, 6, 256
    c, f = setup_scene(rng, cin=cin, lo=0, hi=8)
    n = len(c)
    w = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.3
    cpad = jnp.asarray(pad_rows(c, cap, C.COORD_OFFSET - 1))
    oc, n_out, _ = R.downsample_sites(cpad, jnp.int32(n), 2, cap)
    idx = R.strided_rulebook(cpad, jnp.int32(n), oc, n_out, 2)
    out = np.asarray(
        SC.sparse_conv(
            jnp.asarray(pad_rows(f, cap, 0.0))[None], idx[None], jnp.asarray(w)
        )
    )[0]
    # dense oracle: stride-2 VALID conv, kernel 2, offsets in [0,2)^3 — for
    # non-centered taps, dense w[q] = W[tap(q)] directly (out[o]=sum_q in[2o+q]w[q])
    cin_grid = densify(c, f, 8, cin)
    dk = np.zeros((2, 2, 2, cin, cout), np.float32)
    offsets = np.asarray(C.kernel_offsets(2, centered=False))
    for tap, q in enumerate(offsets):
        dk[q[0], q[1], q[2]] = w[tap]
    dense = run_dense(cin_grid, dk, stride=2)
    oc_np, n_out = np.asarray(oc), int(n_out)
    expected = dense[oc_np[:n_out, 0], oc_np[:n_out, 1], oc_np[:n_out, 2]]
    np.testing.assert_allclose(out[:n_out], expected, rtol=1e-4, atol=1e-4)


def test_inverse_conv_roundtrip_shapes(rng):
    cin, cout, cap = 4, 4, 256
    c, f = setup_scene(rng, cin=cin)
    n = len(c)
    cpad = jnp.asarray(pad_rows(c, cap, C.COORD_OFFSET - 1))
    oc, n_out, _ = R.downsample_sites(cpad, jnp.int32(n), 2, cap)
    coarse_f = rng.normal(size=(cap, cin)).astype(np.float32)
    w = rng.normal(size=(8, cin, cout)).astype(np.float32)
    inv = R.inverse_rulebook(oc, n_out, cpad, jnp.int32(n), 2)
    out = np.asarray(
        SC.sparse_conv(jnp.asarray(coarse_f)[None], inv[None], jnp.asarray(w))
    )[0]
    # brute force: each fine site gets parent feature through its parity tap
    oc_np = np.asarray(oc)
    lut = {tuple(r): i for i, r in enumerate(oc_np[: int(n_out)])}
    offsets = [tuple(o) for o in np.asarray(C.kernel_offsets(2, centered=False))]
    for i in range(n):
        parent = c[i] // 2
        tap = offsets.index(tuple(c[i] - parent * 2))
        expected = coarse_f[lut[tuple(parent)]] @ w[tap]
        np.testing.assert_allclose(out[i], expected, rtol=1e-4, atol=1e-4)


def test_custom_vjp_matches_autodiff(rng):
    cin, cout, cap = 4, 5, 128
    c, f = setup_scene(rng, n=80, cin=cin)
    n = len(c)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2
    idx = R.submanifold_rulebook(
        jnp.asarray(pad_rows(c, cap, C.COORD_OFFSET - 1)), jnp.int32(n), 3
    )[None]
    feats = jnp.asarray(pad_rows(f, cap, 0.0))[None]
    wj = jnp.asarray(w)
    cot = jnp.asarray(rng.normal(size=(1, cap, cout)).astype(np.float32))

    def loss_custom(ff, ww):
        return jnp.sum(SC.sparse_conv(ff, idx, ww) * cot)

    def loss_auto(ff, ww):
        return jnp.sum(SC.gather_matmul_conv(ff, idx, ww) * cot)

    gf1, gw1 = jax.grad(loss_custom, argnums=(0, 1))(feats, wj)
    gf2, gw2 = jax.grad(loss_auto, argnums=(0, 1))(feats, wj)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-4)


def test_concat_executor_matches_scan(rng):
    cin, cout, cap = 4, 5, 128
    c, f = setup_scene(rng, n=90, cin=cin)
    n = len(c)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.3
    idx = R.submanifold_rulebook(
        jnp.asarray(pad_rows(c, cap, C.COORD_OFFSET - 1)), jnp.int32(n), 3
    )[None]
    feats = jnp.asarray(pad_rows(f, cap, 0.0))[None]
    a = np.asarray(SC.gather_matmul_conv(feats, idx, jnp.asarray(w)))
    b = np.asarray(SC.concat_matmul_conv(feats, idx, jnp.asarray(w)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_sparse_conv_t_grads_match(rng):
    """Precomputed-transpose backward == on-the-fly transpose backward."""
    cin, cout, cap = 4, 5, 128
    c, f = setup_scene(rng, n=80, cin=cin)
    n = len(c)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2
    idx = R.submanifold_rulebook(
        jnp.asarray(pad_rows(c, cap, C.COORD_OFFSET - 1)), jnp.int32(n), 3
    )[None]
    t_idx = jnp.flip(idx, axis=1)
    # duality check: flipped == explicitly transposed
    np.testing.assert_array_equal(
        np.asarray(t_idx[0]),
        np.asarray(R.transpose_rulebook(idx[0], cap)),
    )
    feats = jnp.asarray(pad_rows(f, cap, 0.0))[None]
    wj = jnp.asarray(w)
    cot = jnp.asarray(rng.normal(size=(1, cap, cout)).astype(np.float32))

    gf1, gw1 = jax.grad(
        lambda ff, ww: jnp.sum(SC.sparse_conv(ff, idx, ww) * cot), argnums=(0, 1)
    )(feats, wj)
    gf2, gw2 = jax.grad(
        lambda ff, ww: jnp.sum(SC.sparse_conv_t(ff, idx, t_idx, ww) * cot),
        argnums=(0, 1),
    )(feats, wj)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-4)


def test_down_up_rulebook_duality(rng):
    cin = 3
    c, f = setup_scene(rng, n=150, cin=cin)
    cap = 256
    n = len(c)
    cpad = jnp.asarray(pad_rows(c, cap, C.COORD_OFFSET - 1))
    oc, n_out, _ = R.downsample_sites(cpad, jnp.int32(n), 2, cap)
    down = R.strided_rulebook(cpad, jnp.int32(n), oc, n_out, 2)
    up = R.inverse_rulebook(oc, n_out, cpad, jnp.int32(n), 2)
    np.testing.assert_array_equal(
        np.asarray(up), np.asarray(R.transpose_rulebook(down, cap))
    )
    np.testing.assert_array_equal(
        np.asarray(down), np.asarray(R.transpose_rulebook(up, cap))
    )
