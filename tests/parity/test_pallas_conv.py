"""Pallas fused conv executor vs pure-XLA oracle (interpret mode on CPU;
compiled parity is exercised on TPU by bench/verify runs). SURVEY.md §4:
every Pallas kernel has a pure-XLA twin asserted allclose fwd + grad."""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_rcnn_tpu.ops import coords as C
from sparse_rcnn_tpu.ops import pallas_conv as PC
from sparse_rcnn_tpu.ops import rulebook as R
from sparse_rcnn_tpu.ops import sparse_conv as SC


def setup(rng, n=200, cin=16, cout=24, cap=512):
    c = np.unique(rng.integers(0, 10, size=(n, 3)).astype(np.int32), axis=0)
    order = np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
    c = c[order]
    pad = np.full((cap, 3), C.COORD_OFFSET - 1, np.int32)
    pad[: len(c)] = c
    feats = np.zeros((cap, cin), np.float32)
    feats[: len(c)] = rng.normal(size=(len(c), cin))
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2
    idx = R.submanifold_rulebook(jnp.asarray(pad), jnp.int32(len(c)), 3)
    return jnp.asarray(feats)[None], idx[None], jnp.asarray(w)


def test_tap_accumulate_matmul_interpret(rng):
    k, m, cin, cout = 5, 256, 16, 8
    g = jnp.asarray(rng.normal(size=(k, m, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    out = PC.tap_accumulate_matmul(g, w, interpret=True, tile_m=128)
    expected = jnp.einsum("kmc,kcd->md", g, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)


def test_pallas_conv_matches_oracle(rng):
    feats, idx, w = setup(rng)
    a = np.asarray(SC.gather_matmul_conv(feats, idx, w))
    b = np.asarray(PC.pallas_conv(feats, idx, w, interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_executor_mode_switch(rng):
    feats, idx, w = setup(rng, cap=512)
    try:
        SC.set_executor_mode("scan")
        a = np.asarray(SC.sparse_conv(feats, idx, w))
        SC.set_executor_mode("concat")
        b = np.asarray(SC.sparse_conv(feats, idx, w))
    finally:
        SC.set_executor_mode("auto")
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_tap_accumulate_nondivisible_m(rng):
    """tile_m no longer asserts on capacities that are multiples of 128 but
    not of 512 (config.scale_capacities can produce e.g. 3456)."""
    for m in (3456, 200, 8):
        k, cin, cout = 3, 4, 8
        g = jnp.asarray(rng.normal(size=(k, m, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
        out = PC.tap_accumulate_matmul(g, w, interpret=True)
        expected = jnp.einsum("kmc,kcd->md", g, w)
        assert out.shape == (m, cout)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=1e-4, atol=1e-4)


def test_blocked_executor_matches_oracle(rng):
    feats, idx, w = setup(rng)
    a = np.asarray(SC.gather_matmul_conv(feats, idx, w))
    # block smaller than M_out forces real tiling (incl. a ragged last tile)
    b = np.asarray(SC.blocked_matmul_conv(feats, idx, w, block=100))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    c = np.asarray(SC.blocked_matmul_conv(feats, idx, w, use_pallas=True,
                                          block=128))
    np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-4)


def test_blocked_and_pallas_modes_grads(rng):
    """Full custom-VJP parity for the blocked + pallas executor modes."""
    feats, idx, w = setup(rng, n=80, cap=128)

    def loss(mode):
        try:
            SC.set_executor_mode(mode)
            def f(ff, ww):
                return jnp.sum(SC.sparse_conv(ff, idx, ww) ** 2)
            return jax.value_and_grad(f, argnums=(0, 1))(feats, w)
        finally:
            SC.set_executor_mode("auto")

    (l0, (df0, dw0)) = loss("scan")
    for mode in ("blocked", "pallas"):
        l1, (df1, dw1) = loss(mode)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(df0), np.asarray(df1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dw0), np.asarray(dw1),
                                   rtol=1e-4, atol=1e-4)
