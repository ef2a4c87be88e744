"""JsonlLogger: jsonl contract + optional TensorBoard mirror (SURVEY §5)."""

import json
import os

import pytest

from sparse_rcnn_tpu.utils.logging import JsonlLogger


def test_jsonl_file_and_numeric_coercion(tmp_path):
    p = tmp_path / "log.jsonl"
    log = JsonlLogger(str(p), also_stdout=False)
    import numpy as np

    log.log("train", step=1, loss=np.float32(0.5), name="run")
    log.log("eval", step=2, **{"mAP@0.5": 0.75})
    log.close()
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert lines[0]["kind"] == "train"
    assert lines[0]["loss"] == 0.5 and isinstance(lines[0]["loss"], float)
    assert lines[1]["mAP@0.5"] == 0.75


def test_tensorboard_mirror(tmp_path):
    pytest.importorskip("torch.utils.tensorboard")
    tb = tmp_path / "tb"
    log = JsonlLogger(None, also_stdout=False, tb_dir=str(tb))
    log.log("train", step=3, loss=1.25, scenes_per_sec=2.0, tag="x")
    log.log("note", msg="no numerics, no step")  # must not raise
    log.close()
    events = [f for f in os.listdir(tb) if "tfevents" in f]
    assert events, "SummaryWriter wrote no event file"
    assert (tb / events[0]).stat().st_size > 0
