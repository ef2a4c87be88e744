"""CLI + driver-entry smoke tests (in-process; conftest pins CPU x8)."""

import sys

import numpy as np
import pytest


def test_graft_entry_forward():
    sys.path.insert(0, ".")
    import __graft_entry__ as G

    fn, args = G.entry()
    out = fn(*args)
    assert np.isfinite(np.asarray(out)).any()


def test_graft_entry_multichip():
    sys.path.insert(0, ".")
    import __graft_entry__ as G

    G.dryrun_multichip(8)


def test_train_cli_tiny(tmp_path, monkeypatch):
    sys.path.insert(0, ".")
    import train as train_cli

    monkeypatch.setattr(sys, "argv", [
        "train.py",
        "--set", "data.num_points=512",
        "--set", "data.voxel_capacity=256",
        "--set", "data.batch_size=2",
        "--set", "data.voxel_size=[0.2,0.2,0.2]",
        "--set", "model.backbone.widths=[8,16]",
        "--set", "model.rpn.hidden=8",
        "--set", "model.rpn.num_proposals=4",
        "--set", "model.rpn.pre_nms_topk=16",
        "--set", "model.roi.grid_size=3",
        "--set", "model.roi.hidden=8",
        "--set", "model.roi.mask_grid=6",
        "--set", "model.num_classes=3",
        "--set", "model.max_instances=6",
        "--set", "train.total_steps=3",
        "--set", "train.log_every=1",
        "--set", "train.eval_every=1000",
        "--set", "train.checkpoint_every=1000",
        "--set", f"train.checkpoint_dir={tmp_path}/ckpt",
        "--set", "parallel.num_devices=2",
    ])
    train_cli.main()


def test_eval_cli_random_init(tmp_path, monkeypatch, capsys):
    sys.path.insert(0, ".")
    import eval as eval_cli

    monkeypatch.setattr(sys, "argv", [
        "eval.py",
        "--set", "data.num_points=512",
        "--set", "data.voxel_capacity=256",
        "--set", "data.batch_size=2",
        "--set", "data.voxel_size=[0.2,0.2,0.2]",
        "--set", "model.backbone.widths=[8,16]",
        "--set", "model.rpn.hidden=8",
        "--set", "model.rpn.num_proposals=4",
        "--set", "model.rpn.pre_nms_topk=16",
        "--set", "model.roi.grid_size=3",
        "--set", "model.roi.hidden=8",
        "--set", "model.roi.mask_grid=6",
        "--set", "model.num_classes=3",
        "--set", "model.max_instances=6",
        "--set", f"train.checkpoint_dir={tmp_path}/none",
        "--max-batches", "2",
    ])
    eval_cli.main()
    outlines = capsys.readouterr().out.strip().splitlines()
    assert any('"mAP@0.5"' in l for l in outlines)


def test_train_cli_best_checkpoint_then_eval_best(tmp_path, monkeypatch, capsys):
    """Mid-run evals retain the best-mAP weights in <ckpt_dir>_best, and
    `eval.py --best` restores them."""
    sys.path.insert(0, ".")
    import train as train_cli
    import eval as eval_cli

    common = [
        "--set", "data.num_points=512",
        "--set", "data.voxel_capacity=256",
        "--set", "data.batch_size=2",
        "--set", "data.voxel_size=[0.2,0.2,0.2]",
        "--set", "model.backbone.widths=[8,16]",
        "--set", "model.rpn.hidden=8",
        "--set", "model.rpn.num_proposals=4",
        "--set", "model.rpn.pre_nms_topk=16",
        "--set", "model.roi.grid_size=3",
        "--set", "model.roi.hidden=8",
        "--set", "model.roi.mask_grid=6",
        "--set", "model.num_classes=3",
        "--set", "model.max_instances=6",
        "--set", f"train.checkpoint_dir={tmp_path}/ckpt",
        "--set", "parallel.num_devices=2",
    ]
    monkeypatch.setattr(sys, "argv", ["train.py", *common,
        "--set", "train.total_steps=2",
        "--set", "train.log_every=1",
        "--set", "train.eval_every=2",
        "--set", "train.checkpoint_every=1000",
    ])
    train_cli.main()
    out = capsys.readouterr().out
    assert '"checkpoint_best"' in out
    import os
    assert os.path.isdir(f"{tmp_path}/ckpt_best")

    monkeypatch.setattr(sys, "argv", ["eval.py", *common,
                                      "--best", "--max-batches", "1"])
    eval_cli.main()
    outlines = capsys.readouterr().out.strip().splitlines()
    assert any('"restored"' in l for l in outlines)
    assert any('"mAP@0.5"' in l for l in outlines)
