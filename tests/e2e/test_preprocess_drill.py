"""RAW-data → preprocess → train → eval drill (VERDICT r3 item 8).

The loaders were proven against pre-made fixture files (unit/test_datasets_io)
but nothing exercised `scripts/preprocess_scannet.py` / `preprocess_s3dis.py`
END TO END into training. This drill generates tiny fixtures in the RAW
release formats (ScanNet ply + segs/aggregation json, S3DIS annotation txt
rooms), runs the actual preprocessor CLIs over them, then drives train.py and
eval.py on the preprocessed output — the exact day-one path a user with real
data walks. SemanticKITTI needs no preprocessor (the reader consumes raw
.bin/.label directly) and its raw→train path is covered by
unit/test_datasets_io.

Reference-parity note: the reference tree is empty (SURVEY.md §0); the raw
layouts here follow the official dataset releases the preprocessors target.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from tests.unit.test_ply import write_binary_ply  # raw ScanNet ply writer


TINY = [
    "--set", "data.num_points=512",
    "--set", "data.voxel_capacity=512",
    "--set", "data.batch_size=2",
    "--set", "data.voxel_size=[0.1,0.1,0.1]",
    "--set", "model.backbone.widths=[8,16]",
    "--set", "model.rpn.hidden=8",
    "--set", "model.rpn.num_proposals=4",
    "--set", "model.rpn.pre_nms_topk=16",
    "--set", "model.roi.grid_size=3",
    "--set", "model.roi.hidden=8",
    "--set", "model.roi.mask_grid=6",
    "--set", "model.max_instances=6",
    "--set", "train.total_steps=2",
    "--set", "train.log_every=1",
    "--set", "train.eval_every=1000",
    "--set", "train.checkpoint_every=1000",
    "--set", "parallel.num_devices=2",
]


def _room_points(rng, n_floor=200, instances=()):
    """A 3x3x1.5 m room: floor slab + one point blob per instance spec.

    instances: sequence of (center_xyz, nyu40_or_cls_id, n_points).
    Returns (points, per-point group index with -1 = floor)."""
    pts = [np.column_stack([
        rng.uniform(0, 3.0, n_floor), rng.uniform(0, 3.0, n_floor),
        rng.uniform(0, 0.05, n_floor)]).astype(np.float32)]
    grp = [np.full(n_floor, -1, np.int32)]
    for gi, (center, _label, n) in enumerate(instances):
        pts.append((np.asarray(center, np.float32)
                    + rng.uniform(-0.2, 0.2, (n, 3))).astype(np.float32))
        grp.append(np.full(n, gi, np.int32))
    return np.concatenate(pts), np.concatenate(grp)


def _run_train_eval(monkeypatch, capsys, tmp_path, dataset, data_root,
                    extra=()):
    import eval as eval_cli
    import train as train_cli

    common = [
        "--set", f"data.dataset={dataset}",
        "--set", f"data.data_root={data_root}",
        "--set", f"train.checkpoint_dir={tmp_path}/ckpt_{dataset}",
        *TINY, *extra,
    ]
    monkeypatch.setattr(sys, "argv", ["train.py", *common])
    train_cli.main()
    out = capsys.readouterr().out
    assert '"kind": "train"' in out.replace("'", '"') or '"train"' in out
    monkeypatch.setattr(sys, "argv",
                        ["eval.py", *common, "--max-batches", "1"])
    eval_cli.main()
    outlines = capsys.readouterr().out.strip().splitlines()
    assert any('"mAP@0.5"' in l for l in outlines)


def test_scannet_raw_to_train(tmp_path, monkeypatch, capsys, rng):
    """Official-layout ScanNet scans → preprocess_scannet.py → train/eval."""
    from scripts import preprocess_scannet as PP

    raw = tmp_path / "raw"
    scene_specs = {"scene0000_00": "train", "scene0001_00": "val"}
    for sid in scene_specs:
        d = raw / "scans" / sid
        d.mkdir(parents=True)
        # two instances: a chair (nyu40=5 -> bench 2) and a table (7 -> 4)
        pts, grp = _room_points(rng, instances=[
            ((1.0, 1.0, 0.4), 5, 120), ((2.2, 2.0, 0.5), 7, 120)])
        rgb = rng.integers(0, 255, (len(pts), 3)).astype(np.uint8)
        write_binary_ply(str(d / f"{sid}_vh_clean_2.ply"), pts, rgb)
        # labels.ply: nyu40 ids (floor=2 is outside the 18-class benchmark
        # map and must come out semantic=-1, instance=-1)
        nyu = np.where(grp == 0, 5, np.where(grp == 1, 7, 2)).astype(np.uint16)
        write_binary_ply(str(d / f"{sid}_vh_clean_2.labels.ply"),
                         pts, rgb, label=nyu)
        # segs: one segment per group (+ floor segment 99)
        seg = np.where(grp < 0, 99, grp + 10).astype(int)
        with open(d / f"{sid}_vh_clean_2.0.010000.segs.json", "w") as f:
            json.dump({"segIndices": seg.tolist()}, f)
        with open(d / f"{sid}.aggregation.json", "w") as f:
            json.dump({"segGroups": [
                {"segments": [10], "label": "chair"},
                {"segments": [11], "label": "table"},
            ]}, f)
    splits = tmp_path / "splits"
    splits.mkdir()
    for split in ("train", "val"):
        names = [s for s, sp in scene_specs.items() if sp == split]
        (splits / f"scannetv2_{split}.txt").write_text("\n".join(names))

    out = tmp_path / "scannet_npz"
    monkeypatch.setattr(sys, "argv", [
        "preprocess_scannet.py", "--raw", str(raw), "--out", str(out),
        "--splits-dir", str(splits)])
    PP.main()
    capsys.readouterr()

    # preprocessor output is correct BEFORE training on it
    z = np.load(out / "train" / "scene0000_00.npz")
    assert {"points", "feats", "semantic", "instance"} <= set(z.files)
    assert set(np.unique(z["instance"])) == {-1, 0, 1}
    assert set(np.unique(z["semantic"])) == {-1, 2, 4}  # chair, table
    inst0 = z["semantic"][z["instance"] == 0]
    assert len(set(inst0.tolist())) == 1  # one class per instance

    _run_train_eval(monkeypatch, capsys, tmp_path, "scannet", out,
                    extra=("--set", "model.num_classes=18"))


def test_s3dis_raw_to_train(tmp_path, monkeypatch, capsys, rng):
    """Stanford3dDataset annotation txt rooms → preprocess_s3dis.py →
    Area-split train/eval (Area_5 held out as val)."""
    from scripts import preprocess_s3dis as PP

    raw = tmp_path / "raw"
    for area, room in (("Area_1", "office_1"), ("Area_5", "office_2")):
        ann = raw / area / room / "Annotations"
        ann.mkdir(parents=True)
        for fname, center in (("chair_1.txt", (1.0, 1.0, 0.4)),
                              ("table_1.txt", (2.0, 2.0, 0.5)),
                              ("floor_1.txt", None)):
            if center is None:
                pts = np.column_stack([rng.uniform(0, 3, 150),
                                       rng.uniform(0, 3, 150),
                                       rng.uniform(0, 0.05, 150)])
            else:
                pts = np.asarray(center) + rng.uniform(-0.2, 0.2, (100, 3))
            rgb = rng.integers(0, 255, (len(pts), 3))
            np.savetxt(ann / fname, np.column_stack([pts, rgb]), fmt="%.4f")

    out = tmp_path / "s3dis_npz"
    monkeypatch.setattr(sys, "argv", [
        "preprocess_s3dis.py", "--raw", str(raw), "--out", str(out)])
    PP.main()
    capsys.readouterr()

    files = sorted(os.listdir(out))
    assert files == ["Area_1_office_1.npz", "Area_5_office_2.npz"]
    z = np.load(out / "Area_1_office_1.npz")
    # chair + table are instance classes; floor is semantic-only
    assert set(np.unique(z["instance"])) == {-1, 0, 1}
    assert (z["semantic"] >= 0).all()  # every S3DIS point has a class
    assert z["feats"].min() >= -1.0 and z["feats"].max() <= 1.0

    _run_train_eval(monkeypatch, capsys, tmp_path, "s3dis", out,
                    extra=("--set", "model.num_classes=13"))
