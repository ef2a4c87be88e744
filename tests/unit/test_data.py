import numpy as np
import pytest

from sparse_rcnn_tpu.config import load_config
from sparse_rcnn_tpu.data import synthetic
from sparse_rcnn_tpu.data.augment import augment_scene
from sparse_rcnn_tpu.data.datasets import (
    ScanNetDataset, SyntheticDataset, _pad_scene, build_dataset,
)
from sparse_rcnn_tpu.data.pipeline import Loader


def test_synthetic_scene_labels():
    s = synthetic.generate_scene(0, num_points=1000, num_instances=4, num_classes=5)
    assert s["points"].shape == (1000, 3)
    inst = s["point_instance"]
    assert inst.max() >= 1 and inst.min() == -1
    # instances have consistent semantic labels
    for i in range(inst.max() + 1):
        sems = np.unique(s["point_semantic"][inst == i])
        assert len(sems) == 1 and 0 <= sems[0] < 5


def test_augment_preserves_labels(rng):
    cfg = load_config(overrides={"data": {"jitter_sigma": 0.01,
                                           "elastic_distortion": True}})
    s = synthetic.generate_scene(1, num_points=500)
    a = augment_scene(s, cfg.data, rng)
    np.testing.assert_array_equal(a["point_instance"], s["point_instance"])
    assert not np.allclose(a["points"], s["points"])
    assert a["points"].dtype == np.float32


def test_augment_crop_to_bounds(rng):
    # crop_to_bounds: rotated scenes get a scene-centered crop back to the
    # declared bounds so spans never exceed what grid_extent covers
    bounds = (4.0, 4.0, 3.0)
    cfg = load_config(overrides={"data": {
        "crop_to_bounds": True, "scene_bounds": list(bounds),
        "scale_range": [1.0, 1.0], "jitter_sigma": 0.0}})
    s = synthetic.generate_scene(2, num_points=2000, extent=4.0)
    found_crop = False
    for trial in range(8):
        a = augment_scene(s, cfg.data, rng)
        v = a["valid"].astype(bool)
        assert v.any()
        p = a["points"][v]
        span = p.max(0) - p.min(0)
        assert np.all(span <= np.asarray(bounds) + 1e-5), span
        # invariant vs the uncropped path: cropped rows are a subset of the
        # original valid rows, labels untouched
        assert not v[~s["valid"].astype(bool)].any()
        np.testing.assert_array_equal(a["point_instance"], s["point_instance"])
        found_crop |= v.sum() < s["valid"].astype(bool).sum()
    # over 8 random rotations of a bounds-filling scene, at least one must
    # actually shed corner points (span grows by up to sqrt(2))
    assert found_crop


def test_augment_crop_off_keeps_valid(rng):
    cfg = load_config(overrides={"data": {
        "scene_bounds": [4.0, 4.0, 3.0]}})  # crop_to_bounds defaults False
    s = synthetic.generate_scene(2, num_points=500, extent=4.0)
    a = augment_scene(s, cfg.data, rng)
    np.testing.assert_array_equal(a["valid"], s["valid"])


def test_pad_scene_subsamples_and_pads():
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    feats = np.ones((100, 3), np.float32)
    sem = np.zeros(100, np.int32)
    inst = np.zeros(100, np.int32)
    out = _pad_scene(pts, feats, sem, inst, 64)
    assert out["points"].shape == (64, 3) and out["valid"].all()
    out2 = _pad_scene(pts, feats, sem, inst, 200)
    assert out2["valid"].sum() == 100
    assert (out2["point_instance"][100:] == -1).all()


def test_scene_file_dataset_npz(tmp_path):
    root = tmp_path / "scannet"
    (root / "train").mkdir(parents=True)
    for i in range(3):
        s = synthetic.generate_scene(i, num_points=200)
        np.savez(root / "train" / f"scene{i}.npz",
                 points=s["points"], feats=s["feats"],
                 semantic=s["point_semantic"], instance=s["point_instance"])
    ds = ScanNetDataset(str(root), "train", num_points=256)
    assert len(ds) == 3
    item = ds[0]
    assert item["points"].shape == (256, 3)
    assert item["valid"].sum() == 200
    with pytest.raises(FileNotFoundError):
        ScanNetDataset(str(root), "val", num_points=256)


def test_loader_infinite_and_eval_modes():
    cfg = load_config(overrides={"data": {"num_points": 256, "batch_size": 2,
                                           "augment": False}})
    loader = Loader(cfg, "train", train=True)
    it = iter(loader)
    b = next(it)
    assert b["points"].shape == (2, 256, 3)
    b2 = next(it)
    loader.close()

    ev = Loader(cfg, "val", train=False)
    batches = list(iter(ev))
    assert len(batches) == len(ev.dataset) // 2
    ev.close()


def test_yaml_configs_load():
    import glob
    for path in sorted(glob.glob("configs/*.yaml")):
        cfg = load_config(path)
        assert cfg.name != "default", path
        assert len(cfg.scale_capacities()) == len(cfg.model.backbone.widths)


def test_build_dataset_synthetic():
    cfg = load_config(overrides={"data": {"num_points": 128}})
    ds = build_dataset(cfg, "train")
    assert isinstance(ds, SyntheticDataset)
    assert ds[0]["points"].shape == (128, 3)
