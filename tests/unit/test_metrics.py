import numpy as np
import pytest

from sparse_rcnn_tpu.utils.metrics import InstanceAPEvaluator


def toy_scene(n=100):
    gt_instance = np.full(n, -1, np.int64)
    gt_instance[10:30] = 0
    gt_instance[40:70] = 1
    gt_classes = np.array([0, 1], np.int64)
    return gt_instance, gt_classes


def test_perfect_predictions_map_1():
    ev = InstanceAPEvaluator(num_classes=3)
    gt_instance, gt_classes = toy_scene()
    n = len(gt_instance)
    pred_masks = np.stack([gt_instance == 0, gt_instance == 1])
    ev.add_scene(pred_masks, np.array([0.9, 0.8]), np.array([0, 1]),
                 np.array([True, True]), gt_instance, gt_classes,
                 np.ones(n, bool))
    res = ev.compute()
    assert res["mAP@0.25"] == 1.0 and res["mAP@0.5"] == 1.0


def test_wrong_class_halves_map():
    ev = InstanceAPEvaluator(num_classes=3)
    gt_instance, gt_classes = toy_scene()
    n = len(gt_instance)
    pred_masks = np.stack([gt_instance == 0, gt_instance == 1])
    # second prediction labeled class 2 (wrong) → class 1 has no tp
    ev.add_scene(pred_masks, np.array([0.9, 0.8]), np.array([0, 2]),
                 np.array([True, True]), gt_instance, gt_classes,
                 np.ones(n, bool))
    res = ev.compute()
    assert abs(res["mAP@0.5"] - 0.5) < 1e-6


def test_partial_overlap_threshold_sensitivity():
    ev = InstanceAPEvaluator(num_classes=2, iou_thresholds=(0.25, 0.5))
    gt_instance, gt_classes = toy_scene()
    n = len(gt_instance)
    # prediction covers 10 of 20 points of instance 0 plus 10 bg → IoU = 10/30
    m = np.zeros(n, bool); m[10:20] = True; m[80:90] = True
    pred_masks = np.stack([m, gt_instance == 1])
    ev.add_scene(pred_masks, np.array([0.9, 0.8]), np.array([0, 1]),
                 np.array([True, True]), gt_instance, gt_classes,
                 np.ones(n, bool))
    res = ev.compute()
    assert res["mAP@0.25"] == 1.0    # matches at 0.25 (IoU .33)
    assert abs(res["mAP@0.5"] - 0.5) < 1e-6  # misses at 0.5


def test_duplicate_predictions_penalized():
    ev = InstanceAPEvaluator(num_classes=2, iou_thresholds=(0.5,))
    gt_instance, gt_classes = toy_scene()
    n = len(gt_instance)
    m0 = gt_instance == 0
    pred_masks = np.stack([m0, m0, gt_instance == 1])
    ev.add_scene(pred_masks, np.array([0.9, 0.85, 0.8]),
                 np.array([0, 0, 1]), np.ones(3, bool),
                 gt_instance, gt_classes, np.ones(n, bool))
    res = ev.compute()
    # class 0: tp at rank1, fp at rank2 → AP = 1.0 (recall complete at rank1)
    # but precision drops for later recall levels — all-point AP stays 1.0
    # for class 0; overall mAP still 1.0? No: duplicate is fp after recall=1,
    # contributes nothing to AP. So mAP = 1.0.
    assert res["mAP@0.5"] == 1.0


def test_missed_instance_lowers_recall():
    ev = InstanceAPEvaluator(num_classes=2, iou_thresholds=(0.5,))
    gt_instance, gt_classes = toy_scene()
    gt_classes = np.array([0, 0], np.int64)  # both instances class 0
    n = len(gt_instance)
    pred_masks = np.stack([gt_instance == 0])
    ev.add_scene(pred_masks, np.array([0.9]), np.array([0]),
                 np.ones(1, bool), gt_instance, gt_classes, np.ones(n, bool))
    res = ev.compute()
    assert abs(res["mAP@0.5"] - 0.5) < 1e-6  # found 1 of 2


def test_semantic_miou():
    from sparse_rcnn_tpu.utils.metrics import SemanticMIoUEvaluator
    ev = SemanticMIoUEvaluator(3)
    label = np.array([0, 0, 1, 1, 2, 2, -1])
    pred = np.array([0, 1, 1, 1, 2, 0, 0])
    ev.add(pred, label)
    res = ev.compute()
    # class0: tp1, fp1(from cls2), fn1 -> IoU 1/3; class1: tp2 fp1 -> 2/3; class2: tp1 fn1 -> 1/2
    assert abs(res["mIoU"] - np.mean([1/3, 2/3, 1/2])) < 1e-6
    assert abs(res["accuracy"] - 4/6) < 1e-6


def test_band_average_map_scannet_protocol():
    """"mAP" = AP averaged over IoU 0.5:0.95:0.05 (ScanNet benchmark).
    A perfect mask scores 1.0; a mask with IoU ~0.733 passes 5 of the
    10 band thresholds (.5 .55 .6 .65 .7) and fails the rest."""
    ev = InstanceAPEvaluator(num_classes=2)
    gt_instance, gt_classes = toy_scene()
    n = len(gt_instance)
    perfect = gt_instance == 0
    # gt 1 covers 30 points (40:70); predict 22 of them + 0 spurious:
    # IoU = 22/30 = 0.733 (comfortably between band points .7 and .75)
    part = np.zeros(n, bool)
    part[40:62] = True
    ev.add_scene(np.stack([perfect, part]), np.array([0.9, 0.8]),
                 np.array([0, 1]), np.array([True, True]),
                 gt_instance, gt_classes, np.ones(n, bool))
    res = ev.compute()
    assert res["mAP@0.5"] == 1.0
    # class 0 AP = 1 at every band threshold; class 1 AP = 1 for t <= .7,
    # 0 above -> per-threshold mAP alternates 1.0 / 0.5; band mean = 0.75
    assert abs(res["mAP"] - 0.75) < 1e-6


def test_band_average_disabled():
    ev = InstanceAPEvaluator(num_classes=2, average_band=False)
    gt_instance, gt_classes = toy_scene()
    n = len(gt_instance)
    ev.add_scene(np.stack([gt_instance == 0]), np.array([0.9]),
                 np.array([0]), np.array([True]),
                 gt_instance, gt_classes, np.ones(n, bool))
    assert "mAP" not in ev.compute()


def test_gt_classes_from_points_covers_all_ids():
    """Evaluator GT classes derive from RAW point labels so instance ids
    beyond model.max_instances still score (as unmatched GT) instead of
    crashing — the device GT caps classes at capacity, point ids don't."""
    from sparse_rcnn_tpu.train.evaluate import _gt_classes_from_points

    pinst = np.array([0, 0, 5, 5, 5, -1, 2, 7])
    psem = np.array([3, 3, 1, 1, 2, 9, 0, 4])
    valid = np.ones(8, bool)
    cls = _gt_classes_from_points(pinst, psem, valid)
    assert cls.shape == (8,)
    # segment-max semantics (matches data/gt.py) incl. the mixed-label id 5
    assert cls[0] == 3 and cls[5] == 2 and cls[2] == 0 and cls[7] == 4
    # ids with no points -> -1 (never produced by np.unique(gt_instance))
    assert cls[1] == -1 and cls[3] == -1
    # invalid points are ignored entirely
    cls2 = _gt_classes_from_points(pinst, psem, np.zeros(8, bool))
    assert cls2.shape == (0,)

    # the evaluator scores a scene whose ids exceed any "capacity": the
    # extra instance is unmatched GT, halving class-3 recall is not needed
    # here (different classes) but AP must compute without error
    ev = InstanceAPEvaluator(num_classes=10)
    ev.add_scene(np.stack([pinst == 0]), np.array([0.9]), np.array([3]),
                 np.array([True]), pinst, cls, valid)
    res = ev.compute()
    assert res["mAP@0.5"] > 0.0


def test_per_class_ap_table():
    """compute(per_class=True) emits AP@t/class{c} for classes with GT;
    the mAP stays the mean of exactly those entries."""
    ev = InstanceAPEvaluator(num_classes=3, average_band=False)
    gt_instance, gt_classes = toy_scene()  # gt 0 -> class 0, gt 1 -> class 1
    n = len(gt_instance)
    ev.add_scene(np.stack([gt_instance == 0, np.zeros(n, bool)]),
                 np.array([0.9, 0.8]), np.array([0, 1]),
                 np.array([True, True]), gt_instance, gt_classes,
                 np.ones(n, bool))
    res = ev.compute(per_class=True)
    assert res["AP@0.5/class0"] == 1.0
    assert res["AP@0.5/class1"] == 0.0
    assert "AP@0.5/class2" not in res  # no GT of class 2
    assert res["mAP@0.5"] == pytest.approx(
        (res["AP@0.5/class0"] + res["AP@0.5/class1"]) / 2)
    # default stays table-free
    assert all(not k.startswith("AP@") for k in ev.compute())


def test_per_scene_map_spread():
    """per_scene_map scores each scene ALONE: a perfect scene and an
    all-wrong scene give [1.0, 0.0] even though the pooled split-level
    number sits in between (the spread is the protocol error bar)."""
    ev = InstanceAPEvaluator(num_classes=3)
    gt_instance, gt_classes = toy_scene()
    n = len(gt_instance)
    perfect = np.stack([gt_instance == 0, gt_instance == 1])
    ev.add_scene(perfect, np.array([0.9, 0.8]), np.array([0, 1]),
                 np.array([True, True]), gt_instance, gt_classes,
                 np.ones(n, bool))
    # scene 2: both predictions miss every GT voxel
    wrong = np.zeros((2, n), bool)
    wrong[:, 80:90] = True
    ev.add_scene(wrong, np.array([0.9, 0.8]), np.array([0, 1]),
                 np.array([True, True]), gt_instance, gt_classes,
                 np.ones(n, bool))
    per = ev.per_scene_map(0.5)
    assert per == [1.0, 0.0]
    # pooled number is NOT the mean of per-scene (ranking pools across
    # scenes) but must fall strictly between the extremes here
    pooled = ev.compute()["mAP@0.5"]
    assert 0.0 < pooled < 1.0
