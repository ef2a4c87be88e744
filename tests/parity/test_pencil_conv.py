"""Pencil executor parity (round-3 gather redesign).

The pencil executor exploits z-adjacency of sorted coordinate tables (one
wide gather per (dx,dy) pencil instead of kz narrow per-tap gathers — see
the block comment in ops/sparse_conv.py). These tests pin it EXACTLY to the
scan-executor oracle on real submanifold rulebooks: forward, custom-VJP
gradients through both sparse_conv and sparse_conv_t (flip-enumeration
transpose), bf16, and tiny tile sizes that force multi-tile blocking.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparse_rcnn_tpu.ops import coords as C
from sparse_rcnn_tpu.ops import rulebook as R
from sparse_rcnn_tpu.ops import sparse_conv as SC


def make_sites(seed, n_raw=400, cap=512, span=12):
    rng = np.random.default_rng(seed)
    c = np.unique(
        rng.integers(0, span, size=(n_raw, 3)).astype(np.int32), axis=0)
    n = len(c)
    order = np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
    c = c[order]
    cpad = np.full((cap, 3), C.COORD_OFFSET - 1, np.int32)
    cpad[:n] = c
    return jnp.asarray(cpad), n


def subm_idx(cpad, n, k=3):
    return R.submanifold_rulebook(cpad, jnp.int32(n), k)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("cin,cout", [(8, 16), (32, 32)])
def test_pencil_forward_matches_scan(dtype, cin, cout):
    cpad, n = make_sites(0)
    idx = subm_idx(cpad, n)[None]
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal((1, cpad.shape[0], cin)),
                    dtype=jnp.float32)
    f = (f * (jnp.arange(cpad.shape[0])[None, :, None] < n)).astype(dtype)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)) * 0.1, dtype)
    ref = SC.gather_matmul_conv(f, idx, w)
    out = SC.pencil_matmul_conv(f, idx, w)
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_pencil_center_identity_vs_generic():
    """The slice-based center pencil must equal the gather-based one."""
    cpad, n = make_sites(7)
    idx = subm_idx(cpad, n)[None]
    rng = np.random.default_rng(8)
    f = jnp.asarray(rng.standard_normal((1, cpad.shape[0], 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((27, 8, 8)) * 0.1, jnp.float32)
    a = SC.pencil_matmul_conv(f, idx, w, center_identity=True)
    b = SC.pencil_matmul_conv(f, idx, w, center_identity=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_pencil_grads_match_oracle_through_custom_vjp():
    """sparse_conv (auto→pencil at these sizes) grads == scan-executor
    autodiff grads, including the d_W pencil re-gather."""
    cpad, n = make_sites(3)
    idx = subm_idx(cpad, n)[None]
    rng = np.random.default_rng(4)
    m = cpad.shape[0]
    f = jnp.asarray(rng.standard_normal((1, m, 8)), jnp.float32)
    f = f * (jnp.arange(m)[None, :, None] < n)
    w = jnp.asarray(rng.standard_normal((27, 8, 8)) * 0.1, jnp.float32)

    def loss_custom(f_, w_):
        return jnp.sum(jnp.sin(SC.sparse_conv(f_, idx, w_)))

    def loss_oracle(f_, w_):
        return jnp.sum(jnp.sin(SC.gather_matmul_conv(f_, idx, w_)))

    SC.set_executor_mode("pencil")
    try:
        gf, gw = jax.grad(loss_custom, argnums=(0, 1))(f, w)
    finally:
        SC.set_executor_mode("auto")
    rf, rw = jax.grad(loss_oracle, argnums=(0, 1))(f, w)
    # padding rows may differ (oracle's autodiff writes zeros there anyway)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)


def test_pencil_grads_sparse_conv_t_flip_transpose():
    """sparse_conv_t with the documented flip-enumeration transpose: the
    backward flips back to canonical order for the pencil executor."""
    cpad, n = make_sites(5)
    idx = subm_idx(cpad, n)[None]
    t_idx = jnp.flip(idx, axis=1)  # rulebook duality: t(subm) = subm[::-1]
    rng = np.random.default_rng(6)
    m = cpad.shape[0]
    f = jnp.asarray(rng.standard_normal((1, m, 8)), jnp.float32)
    f = f * (jnp.arange(m)[None, :, None] < n)
    w = jnp.asarray(rng.standard_normal((27, 8, 8)) * 0.1, jnp.float32)

    def loss_t(f_, w_):
        return jnp.sum(jnp.sin(SC.sparse_conv_t(f_, idx, t_idx, w_)))

    def loss_oracle(f_, w_):
        return jnp.sum(jnp.sin(SC.gather_matmul_conv(f_, idx, w_)))

    SC.set_executor_mode("pencil")
    try:
        gf, gw = jax.grad(loss_t, argnums=(0, 1))(f, w)
    finally:
        SC.set_executor_mode("auto")
    rf, rw = jax.grad(loss_oracle, argnums=(0, 1))(f, w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("use_t", [False, True])
def test_shared_pencil_backward_auto_gate(use_t):
    """auto + set_shared_pencil_bwd(True): the pencil branch of the fused
    shared backward (one gather sweep feeding BOTH d_f and d_W) must match
    scan-executor autodiff, through sparse_conv (transpose_rulebook t_idx,
    z-ascending) and sparse_conv_t (flip-enumeration duality t_idx)."""
    cpad, n = make_sites(13)
    idx = subm_idx(cpad, n)[None]
    t_idx = jnp.flip(idx, axis=1)
    rng = np.random.default_rng(14)
    m = cpad.shape[0]
    f = jnp.asarray(rng.standard_normal((1, m, 8)), jnp.float32)
    f = f * (jnp.arange(m)[None, :, None] < n)
    w = jnp.asarray(rng.standard_normal((27, 8, 8)) * 0.1, jnp.float32)

    def loss_custom(f_, w_):
        out = (SC.sparse_conv_t(f_, idx, t_idx, w_) if use_t
               else SC.sparse_conv(f_, idx, w_))
        return jnp.sum(jnp.sin(out))

    def loss_oracle(f_, w_):
        return jnp.sum(jnp.sin(SC.gather_matmul_conv(f_, idx, w_)))

    prev = SC._SHARED_PENCIL_BWD
    SC.set_shared_pencil_bwd(True)
    try:
        assert SC._EXECUTOR_MODE == "auto"
        gf, gw = jax.grad(loss_custom, argnums=(0, 1))(f, w)
    finally:
        SC.set_shared_pencil_bwd(prev)
    rf, rw = jax.grad(loss_oracle, argnums=(0, 1))(f, w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)


def test_pencil_mode_selection():
    assert SC._pencil_ok(27, 32, jnp.bfloat16)
    # auto selects pencil inside the fast gather regime (<= 192B rows)
    assert SC._best_executor(27, 32, 4096, jnp.bfloat16) is SC.pencil_matmul_conv
    assert not SC._pencil_ok(8, 32, jnp.bfloat16)       # k2s2 down conv
    assert not SC._pencil_ok(1, 32, jnp.bfloat16)       # 1x1 proj
    # C=64 bf16 would need 2 slices — measured 2.6x slower than blocked on
    # v5e (same-index gathers don't price independently), so auto keeps
    # the per-tap blocked executor there
    assert SC._pencil_slice_bounds(64, jnp.bfloat16) == [(0, 32), (32, 64)]
    assert not SC._pencil_ok(27, 64, jnp.bfloat16)
    assert SC._best_executor(27, 64, 4096, jnp.bfloat16) is not SC.pencil_matmul_conv
    # uneven split stays within the cap
    assert SC._pencil_slice_bounds(48, jnp.bfloat16) == [(0, 24), (24, 48)]
    # backward executor choice never picks the pencil under auto
    assert SC._best_executor(27, 32, 4096, jnp.bfloat16,
                             auto_pencil=False) is not SC.pencil_matmul_conv


@pytest.mark.parametrize("cin", [48, 64])
def test_pencil_sliced_channels_forward_and_grads(cin):
    """Channel-sliced pencil (2 gathers/pencil) == scan oracle, fwd + grads.

    Multi-slice is MEASURED SLOWER on v5e and gated out of auto/pencil
    modes (see _PENCIL_MAX_ROW_BYTES); this pins the generalized math for
    direct callers via plain autodiff through the executor."""
    cpad, n = make_sites(11)
    idx = subm_idx(cpad, n)[None]
    rng = np.random.default_rng(12)
    m = cpad.shape[0]
    f = jnp.asarray(rng.standard_normal((1, m, cin)), jnp.float32)
    f = (f * (jnp.arange(m)[None, :, None] < n)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((27, cin, 16)) * 0.1, jnp.bfloat16)
    assert len(SC._pencil_slice_bounds(cin, f.dtype)) == 2
    ref = SC.gather_matmul_conv(f, idx, w)
    out = SC.pencil_matmul_conv(f, idx, w)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)

    def loss_pencil(f_, w_):
        return jnp.sum(jnp.sin(
            SC.pencil_matmul_conv(f_, idx, w_).astype(jnp.float32)))

    def loss_oracle(f_, w_):
        return jnp.sum(jnp.sin(
            SC.gather_matmul_conv(f_, idx, w_).astype(jnp.float32)))

    gf, gw = jax.grad(loss_pencil, argnums=(0, 1))(f, w)
    rf, rw = jax.grad(loss_oracle, argnums=(0, 1))(f, w)
    np.testing.assert_allclose(np.asarray(gf, np.float32),
                               np.asarray(rf, np.float32),
                               rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(gw, np.float32),
                               np.asarray(rw, np.float32),
                               rtol=0.1, atol=0.5)
