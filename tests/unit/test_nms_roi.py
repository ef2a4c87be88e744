import jax
import jax.numpy as jnp
import numpy as np

from sparse_rcnn_tpu.ops import nms as N
from sparse_rcnn_tpu.ops import roi as ROI
from sparse_rcnn_tpu.ops import coords as C


def brute_iou(a, b):
    lo = np.maximum(a[:3], b[:3]); hi = np.minimum(a[3:], b[3:])
    inter = np.prod(np.maximum(hi - lo, 0))
    va = np.prod(np.maximum(a[3:] - a[:3], 0))
    vb = np.prod(np.maximum(b[3:] - b[:3], 0))
    return inter / max(va + vb - inter, 1e-9)


def random_boxes(rng, n):
    lo = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    sz = rng.uniform(0.5, 5, (n, 3)).astype(np.float32)
    return np.concatenate([lo, lo + sz], -1)


def test_iou_vs_bruteforce(rng):
    a, b = random_boxes(rng, 20), random_boxes(rng, 15)
    got = np.asarray(N.box_iou_3d(jnp.asarray(a), jnp.asarray(b)))
    for i in range(20):
        for j in range(15):
            np.testing.assert_allclose(got[i, j], brute_iou(a[i], b[j]), rtol=1e-5)


def brute_nms(boxes, scores, valid, thr, k):
    order = np.argsort(-scores)
    keep, removed = [], set()
    for i in order:
        if not valid[i] or i in removed or len(keep) >= k:
            continue
        keep.append(i)
        for j in range(len(boxes)):
            if j != i and brute_iou(boxes[i], boxes[j]) >= thr:
                removed.add(j)
    return keep


def test_nms_vs_bruteforce(rng):
    n, k = 40, 10
    boxes = random_boxes(rng, n)
    scores = rng.normal(size=n).astype(np.float32)
    valid = rng.random(n) > 0.2
    keep_idx, keep_mask = N.nms_3d(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.3, k
    )
    got = [int(i) for i, m in zip(np.asarray(keep_idx), np.asarray(keep_mask)) if m]
    expected = brute_nms(boxes, scores, valid, 0.3, k)
    assert got == expected


def test_topk_rows(rng):
    scores = rng.normal(size=30).astype(np.float32)
    valid = rng.random(30) > 0.5
    vals, idx, mask = N.topk_rows(jnp.asarray(scores), jnp.asarray(valid), 8)
    vals, idx, mask = map(np.asarray, (vals, idx, mask))
    expect = np.sort(scores[valid])[::-1][:8]
    np.testing.assert_allclose(vals[mask], expect[: mask.sum()], rtol=1e-6)


def grid_table(size):
    g = np.stack(np.meshgrid(*[np.arange(size)] * 3, indexing="ij"), -1).reshape(-1, 3)
    order = np.lexsort((g[:, 2], g[:, 1], g[:, 0]))
    return g[order].astype(np.int32)


def test_trilinear_on_full_grid_matches_linear_field(rng):
    # feats = linear function of position → trilinear sampling is exact
    size = 8
    tc = grid_table(size)
    centers = tc + 0.5
    w = np.array([[1.0, -2.0, 0.5]], np.float32)
    feats = (centers @ w.T).astype(np.float32)  # [M, 1]
    pos = rng.uniform(1.0, size - 1.0, (50, 3)).astype(np.float32)
    out = np.asarray(
        ROI.sample_trilinear(
            jnp.asarray(tc), jnp.int32(len(tc)), jnp.asarray(feats), jnp.asarray(pos)
        )
    )
    expected = pos @ w.T.astype(np.float32)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_trilinear_empty_space_is_zero(rng):
    tc = grid_table(4)
    feats = np.ones((len(tc), 2), np.float32)
    pos = np.array([[100.0, 100.0, 100.0]], np.float32)
    out = np.asarray(
        ROI.sample_trilinear(jnp.asarray(tc), jnp.int32(len(tc)), jnp.asarray(feats), jnp.asarray(pos))
    )
    np.testing.assert_allclose(out, 0.0)


def test_sample_nearest_labels(rng):
    tc = grid_table(4)
    labels = np.arange(len(tc), dtype=np.int32)
    pos = tc.astype(np.float32) + rng.uniform(0.05, 0.95, tc.shape).astype(np.float32)
    out = np.asarray(
        ROI.sample_nearest(jnp.asarray(tc), jnp.int32(len(tc)), jnp.asarray(labels), jnp.asarray(pos))
    )
    np.testing.assert_array_equal(out, labels)
    # outside → fill
    far = np.asarray(
        ROI.sample_nearest(jnp.asarray(tc), jnp.int32(len(tc)), jnp.asarray(labels),
                           jnp.asarray(np.array([[50.0, 0, 0]], np.float32)))
    )
    assert far[0] == -1


def test_roi_crop_shapes_and_content(rng):
    tc = grid_table(8)
    feats = rng.normal(size=(len(tc), 3)).astype(np.float32)
    boxes = jnp.asarray(np.array([[1.0, 1, 1, 5, 5, 5], [0, 0, 0, 8, 8, 8]], np.float32))
    out = ROI.roi_crop(jnp.asarray(tc), jnp.int32(len(tc)), jnp.asarray(feats), boxes, 4)
    assert out.shape == (2, 4, 4, 4, 3)
    assert np.isfinite(np.asarray(out)).all()
