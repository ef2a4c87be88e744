"""C++ host core vs device (XLA) implementations — independent algorithms
(open-addressing hash vs sort+binary-search) must agree exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_rcnn_tpu import native
from sparse_rcnn_tpu.ops import coords as C
from sparse_rcnn_tpu.ops import rulebook as R
from sparse_rcnn_tpu.ops import voxelize as V

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / build failed"
)


def test_native_voxelize_matches_device(rng):
    n, c, cap = 2000, 4, 1024
    pts = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, c)).astype(np.float32)
    valid = rng.random(n) > 0.1
    vs = np.array([0.22, 0.3, 0.18], np.float32)

    nc, nf, nn, np2v, novf = native.voxelize_scene(pts, feats, valid, vs, cap)
    dc, df, dn, dp2v, dovf = V.voxelize_scene(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(valid),
        jnp.asarray(vs), cap,
    )
    assert nn == int(dn) and novf == int(dovf)
    np.testing.assert_array_equal(nc[:nn], np.asarray(dc)[:nn])
    np.testing.assert_array_equal(np2v, np.asarray(dp2v))
    np.testing.assert_allclose(nf[:nn], np.asarray(df)[:nn], rtol=1e-5, atol=1e-5)


def test_native_voxelize_overflow_matches_device(rng):
    n, c, cap = 3000, 2, 64
    pts = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, c)).astype(np.float32)
    valid = np.ones(n, bool)
    vs = np.array([0.05, 0.05, 0.05], np.float32)
    nc, nf, nn, np2v, novf = native.voxelize_scene(pts, feats, valid, vs, cap)
    dc, df, dn, dp2v, dovf = V.voxelize_scene(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(valid),
        jnp.asarray(vs), cap,
    )
    assert nn == int(dn) == cap
    assert novf == int(dovf) > 0
    np.testing.assert_array_equal(nc, np.asarray(dc))
    np.testing.assert_array_equal(np2v, np.asarray(dp2v))


def test_native_rulebook_matches_device(rng):
    cap = 512
    c = np.unique(rng.integers(-9, 9, (400, 3)).astype(np.int32), axis=0)
    order = np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
    c = c[order]
    n = len(c)
    padded = np.full((cap, 3), C.COORD_OFFSET - 1, np.int32)
    padded[:n] = c
    got = native.subm_rulebook(padded, n, 3)
    expected = np.asarray(
        R.submanifold_rulebook(jnp.asarray(padded), jnp.int32(n), 3)
    )
    np.testing.assert_array_equal(got, expected)


def test_host_voxelize_pipeline_matches_device(rng):
    """Train losses identical whether voxelization ran on host (C++) or
    device (sort/segment) — the two input paths are interchangeable."""
    import jax.numpy as jnp2
    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data import synthetic
    from sparse_rcnn_tpu.data.pipeline import host_voxelize_scene
    from sparse_rcnn_tpu.train import loop as TL

    cfg = load_config(overrides={
        "data": {"num_points": 512, "voxel_capacity": 256, "batch_size": 2,
                  "voxel_size": [0.2, 0.2, 0.2], "host_voxelize": True},
        "model": {
            "backbone": {"widths": [8, 16], "blocks_per_scale": 1},
            "rpn": {"hidden": 8, "num_proposals": 4, "pre_nms_topk": 16},
            "roi": {"grid_size": 3, "hidden": 8, "mask_grid": 6},
            "num_classes": 3, "max_instances": 6,
        },
    })
    scenes = [synthetic.generate_scene(77 + i, num_points=512, num_instances=2,
                                       num_classes=3) for i in range(2)]
    device_batch = {k: jnp2.asarray(np.stack([s[k] for s in scenes]))
                    for k in scenes[0]}
    host_scenes = [host_voxelize_scene(s, cfg) for s in scenes]
    host_batch = {k: jnp2.asarray(np.stack([s[k] for s in host_scenes]))
                  for k in host_scenes[0]}

    state = TL.init_state(cfg, device_batch)
    step = TL.make_train_step(cfg)
    import jax as _jax
    s1, m1 = step(_jax.tree_util.tree_map(jnp2.copy, state), device_batch)
    s2, m2 = step(_jax.tree_util.tree_map(jnp2.copy, state), host_batch)
    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                               rtol=1e-5)
