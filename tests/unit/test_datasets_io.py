"""Real-data-format loader proof (VERDICT r1 item 6; SURVEY.md C16–C18).

Generates tiny fixture files in each on-disk format the readers claim to
support — torch ``.pth`` (tuple AND dict layouts), an S3DIS Area-split tree,
and a SemanticKITTI ``velodyne/*.bin`` + ``labels/*.label`` pair — then
drives the full loader → voxelize → train-step path over each.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_rcnn_tpu.config import load_config
from sparse_rcnn_tpu.data.datasets import (
    S3DISDataset,
    ScanNetDataset,
    SemanticKITTIDataset,
    build_dataset,
)


def _scene_arrays(rng, n=500):
    points = rng.uniform(0, 2.0, size=(n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    sem = rng.integers(0, 5, n).astype(np.int32)
    inst = rng.integers(-1, 3, n).astype(np.int32)
    return points, colors, sem, inst


# ---------------------------------------------------------------- fixtures

def make_scannet_pth(root, rng):
    """Two scenes: one tuple-layout .pth, one dict-layout .pth (both common
    preprocessed-ScanNet conventions), under <root>/train/."""
    import torch

    d = os.path.join(root, "train")
    os.makedirs(d, exist_ok=True)
    p, c, s, i = _scene_arrays(rng)
    torch.save(
        (torch.from_numpy(p), torch.from_numpy(c),
         torch.from_numpy(s), torch.from_numpy(i)),
        os.path.join(d, "scene0000_00.pth"),
    )
    p2, c2, s2, i2 = _scene_arrays(rng, 300)
    torch.save(
        {"points": p2, "colors": c2, "semantic": s2, "instance": i2},
        os.path.join(d, "scene0001_00.pth"),
    )
    return (p, c, s, i), (p2, c2, s2, i2)


def make_s3dis_tree(root, rng):
    """Flat Area_<n>_<room>.npz files — split = held-out test area."""
    os.makedirs(root, exist_ok=True)
    for name in ("Area_1_office_1", "Area_2_hallway_3", "Area_5_office_2"):
        p, c, s, i = _scene_arrays(rng, 400)
        np.savez(os.path.join(root, name + ".npz"),
                 points=p, feats=c, semantic=s, instance=i)


def make_kitti_tree(root, rng, seq="08", n=800):
    """sequences/<seq>/velodyne/000000.bin + labels/000000.label with
    semantic in the lower 16 bits and sparse instance ids in the upper 16."""
    vdir = os.path.join(root, "sequences", seq, "velodyne")
    ldir = os.path.join(root, "sequences", seq, "labels")
    os.makedirs(vdir, exist_ok=True)
    os.makedirs(ldir, exist_ok=True)
    pts = rng.uniform(-20, 20, size=(n, 3)).astype(np.float32)
    remission = rng.uniform(0, 1, size=(n, 1)).astype(np.float32)
    np.concatenate([pts, remission], axis=1).tofile(
        os.path.join(vdir, "000000.bin"))
    sem = rng.integers(0, 20, n).astype(np.uint32)
    # instance ids deliberately sparse/non-dense: {0 (none), 7, 1000, 70000}
    inst = rng.choice(np.array([0, 0, 7, 1000, 70000], np.uint32), n)
    label = (inst.astype(np.uint32) << 16) | sem
    label.tofile(os.path.join(ldir, "000000.label"))
    return pts, remission, sem.astype(np.int32), inst


# ------------------------------------------------------------------ tests

def test_scannet_pth_tuple_and_dict(tmp_path, rng):
    (p, c, s, i), (p2, c2, s2, i2) = make_scannet_pth(str(tmp_path), rng)
    ds = ScanNetDataset(str(tmp_path), "train", num_points=1024)
    assert len(ds) == 2
    a, b = ds[0], ds[1]
    for scene, (pp, cc, ss, ii) in ((a, (p, c, s, i)), (b, (p2, c2, s2, i2))):
        n = len(pp)
        assert scene["valid"].sum() == n
        np.testing.assert_allclose(scene["points"][:n], pp, rtol=1e-6)
        np.testing.assert_allclose(scene["feats"][:n], cc, rtol=1e-6)
        np.testing.assert_array_equal(scene["point_semantic"][:n], ss)
        np.testing.assert_array_equal(scene["point_instance"][:n], ii)
        assert (~scene["valid"][n:]).all()
        assert (scene["point_instance"][n:] == -1).all()


def test_s3dis_area_split(tmp_path, rng):
    make_s3dis_tree(str(tmp_path), rng)
    tr = S3DISDataset(str(tmp_path), "train", num_points=512)
    va = S3DISDataset(str(tmp_path), "val", num_points=512)
    assert len(tr) == 2 and len(va) == 1  # Area_5 held out
    assert all("Area_5" not in f for f in tr.files)
    assert all("Area_5" in f for f in va.files)
    scene = va[0]
    assert scene["points"].shape == (512, 3)
    assert scene["valid"].sum() == 400


def test_semantic_kitti_bin_label(tmp_path, rng):
    pts, remission, sem, inst_raw = make_kitti_tree(str(tmp_path), rng)
    ds = SemanticKITTIDataset(str(tmp_path), "val", num_points=1024,
                              num_features=1)
    assert len(ds) == 1
    scene = ds[0]
    n = len(pts)
    np.testing.assert_allclose(scene["points"][:n], pts, rtol=1e-6)
    np.testing.assert_allclose(scene["feats"][:n, 0], remission[:, 0],
                               rtol=1e-6)
    # lower 16 bits -> semantic
    np.testing.assert_array_equal(scene["point_semantic"][:n], sem)
    # upper 16 bits -> instances, densely re-indexed, 0 = background(-1)
    got = scene["point_instance"][:n]
    assert (got[inst_raw == 0] == -1).all()
    uniq_raw = np.unique(inst_raw[inst_raw > 0])
    uniq_got = np.unique(got[got >= 0])
    np.testing.assert_array_equal(uniq_got, np.arange(len(uniq_raw)))
    # same raw id -> same dense id (order-preserving remap)
    for new, old in enumerate(uniq_raw):
        assert (got[inst_raw == old] == new).all()


def test_loader_to_train_step_all_formats(tmp_path, rng):
    """Full path: on-disk file -> Loader -> voxelize -> one train step, for
    each dataset format, sharing one compiled step (same shapes)."""
    from sparse_rcnn_tpu.data.pipeline import Loader
    from sparse_rcnn_tpu.train import loop as TL

    make_scannet_pth(str(tmp_path / "scannet"), rng)
    make_s3dis_tree(str(tmp_path / "s3dis"), rng)
    make_kitti_tree(str(tmp_path / "kitti"), rng)

    def cfg_for(dataset, root, voxel=0.1):
        return load_config(overrides={
            "data": {"dataset": dataset, "data_root": root,
                      "num_points": 1024, "voxel_capacity": 1024,
                      "batch_size": 2, "voxel_size": [voxel] * 3,
                      "num_workers": 2},
            "model": {"backbone": {"widths": [8, 16], "blocks_per_scale": 1},
                       "rpn": {"hidden": 8, "num_proposals": 8,
                                "pre_nms_topk": 32},
                       "roi": {"grid_size": 4, "hidden": 8, "mask_grid": 8},
                       "num_classes": 20, "max_instances": 8},
            "train": {"warmup_steps": 1, "total_steps": 10},
        })

    step = None
    state = None
    for dataset, root, split in (
        ("scannet", str(tmp_path / "scannet"), "train"),
        ("s3dis", str(tmp_path / "s3dis"), "train"),
        ("semantic_kitti", str(tmp_path / "kitti"), "val"),
    ):
        cfg = cfg_for(dataset, root)
        loader = Loader(cfg, split=split, train=True, seed=0)
        batch = next(iter(loader))
        loader.close()
        assert batch["points"].shape == (2, 1024, 3)
        if step is None:
            state = TL.init_state(cfg, batch)
            step = TL.make_train_step(cfg)
        state, metrics = step(state, batch)
        total = float(metrics["total"])
        assert np.isfinite(total), (dataset, metrics)
        assert float(metrics["voxels_per_scene"]) > 0, dataset


def test_synthetic_num_scenes_knob():
    # data.num_scenes overrides the max(64, batch*8) synthetic pool default
    # (the 64-scene pool overfits detection heads — BASELINE.md quality notes)
    cfg = load_config(overrides={"data": {"dataset": "synthetic_hard",
                                          "num_scenes": 17}})
    assert len(build_dataset(cfg, "train")) == 17
    # TRAIN-only: growing the train pool must not move the val/test pools
    # (quality-trajectory comparability — round-3 advisor finding)
    assert len(build_dataset(cfg, "val")) == 64
    cfg = load_config(overrides={"data": {"dataset": "synthetic_hard"}})
    assert len(build_dataset(cfg, "train")) == 64
    # val_scenes pins the val/test pools independently
    cfg = load_config(overrides={"data": {"dataset": "synthetic_hard",
                                          "num_scenes": 256,
                                          "val_scenes": 32}})
    assert len(build_dataset(cfg, "train")) == 256
    assert len(build_dataset(cfg, "val")) == 32
    assert len(build_dataset(cfg, "test")) == 32
    # scene IDENTITY is pool-size independent: scene i is a pure function
    # of (split, i), so shrinking val_scenes keeps the same leading scenes
    small = build_dataset(cfg, "val")
    big = build_dataset(load_config(overrides={
        "data": {"dataset": "synthetic_hard"}}), "val")
    np.testing.assert_array_equal(small[3]["points"], big[3]["points"])
    # an explicit 0 must error at load time, not silently use the default
    import pytest

    for key in ("num_scenes", "val_scenes"):
        with pytest.raises(ValueError):
            load_config(overrides={"data": {"dataset": "synthetic",
                                            key: 0}})
    with pytest.raises(ValueError):
        load_config(overrides={"train": {"eval_scenes": 0}})
