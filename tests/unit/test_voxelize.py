import jax.numpy as jnp
import numpy as np

from sparse_rcnn_tpu.ops import voxelize as V


def make_cloud(rng, n=500, c=4):
    pts = rng.uniform(-2.0, 2.0, size=(n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, c)).astype(np.float32)
    return pts, feats


def test_voxelize_scene_matches_numpy(rng):
    pts, feats = make_cloud(rng)
    vs = 0.25
    valid = np.ones(len(pts), bool)
    cap = 1024
    vc, vf, nv, p2v, ovf = V.voxelize_scene(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(valid), vs, cap
    )
    vc, vf, nv, p2v, ovf = map(np.asarray, (vc, vf, nv, p2v, ovf))
    ic = np.floor(pts / vs).astype(np.int32)
    expected = np.unique(ic, axis=0)
    assert nv == len(expected) and ovf == 0
    np.testing.assert_array_equal(vc[:nv], expected)
    # segment means
    for i in range(int(nv)):
        members = (ic == vc[i]).all(1)
        np.testing.assert_allclose(vf[i], feats[members].mean(0), rtol=1e-5, atol=1e-5)
    # p2v maps each point to its voxel
    np.testing.assert_array_equal(vc[p2v], ic)


def test_devoxelize_roundtrip(rng):
    pts, feats = make_cloud(rng, n=300)
    valid = np.ones(len(pts), bool)
    st, p2v, ovf = V.voxelize_batch(
        jnp.asarray(pts)[None], jnp.asarray(feats)[None], jnp.asarray(valid)[None],
        0.5, 256,
    )
    labels = np.arange(st.capacity, dtype=np.int32)
    back = np.asarray(V.devoxelize(jnp.asarray(labels)[None], p2v, fill_value=-1))[0]
    # every point gets its own voxel's label
    np.testing.assert_array_equal(back, np.asarray(p2v)[0])


def test_voxelize_overflow_policy(rng):
    pts, feats = make_cloud(rng, n=400)
    valid = np.ones(len(pts), bool)
    cap = 16  # force overflow
    vc, vf, nv, p2v, ovf = V.voxelize_scene(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(valid), 0.1, cap
    )
    assert int(ovf) > 0
    assert int(nv) == cap
    # dropped points marked -1, surviving ones still map correctly
    p2v = np.asarray(p2v)
    ic = np.floor(pts / 0.1).astype(np.int32)
    keep = p2v >= 0
    np.testing.assert_array_equal(np.asarray(vc)[p2v[keep]], ic[keep])


def test_anisotropic_voxel_size(rng):
    pts, feats = make_cloud(rng, n=200)
    valid = np.ones(len(pts), bool)
    vs = np.array([0.5, 0.25, 1.0], np.float32)  # KITTI-style anisotropic grid
    vc, vf, nv, p2v, ovf = V.voxelize_scene(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(valid), jnp.asarray(vs), 2048
    )
    ic = np.floor(pts / vs).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(vc)[np.asarray(p2v)], ic)
