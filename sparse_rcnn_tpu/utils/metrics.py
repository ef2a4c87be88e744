"""3D instance-segmentation mAP evaluator (SURVEY.md C22).

ScanNet-protocol average precision over per-point instance masks: greedy
score-ordered matching of predictions to GT instances of the same class at
an IoU threshold, then class-wise AP (all-point interpolation), averaged.
Host-side numpy — the metric aggregates across a whole validation split and
is not a jit target (same split as the reference's evaluator role; tree
empty at survey, §0).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np


class SemanticMIoUEvaluator:
    """Per-class IoU / mIoU over labeled voxels or points (aux semantic head)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self._conf = np.zeros((num_classes, num_classes), np.int64)

    def add(self, pred: np.ndarray, label: np.ndarray) -> None:
        """pred int[N] predicted class, label int[N] (-1 = unlabeled)."""
        keep = (label >= 0) & (label < self.num_classes) & (pred >= 0) & (
            pred < self.num_classes
        )
        idx = label[keep] * self.num_classes + pred[keep]
        self._conf += np.bincount(
            idx, minlength=self.num_classes ** 2
        ).reshape(self.num_classes, self.num_classes)

    def compute(self) -> Dict[str, float]:
        tp = np.diag(self._conf).astype(np.float64)
        denom = self._conf.sum(0) + self._conf.sum(1) - tp
        present = denom > 0
        iou = np.where(present, tp / np.maximum(denom, 1), np.nan)
        return {
            "mIoU": float(np.nanmean(iou)) if present.any() else 0.0,
            "accuracy": float(tp.sum() / max(self._conf.sum(), 1)),
        }


class InstanceAPEvaluator:
    """Accumulate scenes, then compute mAP at given IoU thresholds."""

    def __init__(self, num_classes: int, iou_thresholds: Sequence[float] = (0.25, 0.5)):
        self.num_classes = num_classes
        self.iou_thresholds = tuple(iou_thresholds)
        self._preds: List[dict] = []  # per scene

    def add_scene(
        self,
        pred_masks: np.ndarray,     # bool [P, N] per-point masks
        pred_scores: np.ndarray,    # [P]
        pred_classes: np.ndarray,   # int [P]
        pred_valid: np.ndarray,     # bool [P]
        gt_instance: np.ndarray,    # int [N] per-point instance id (-1 none)
        gt_classes: np.ndarray,     # int [I] class per instance id
        point_valid: np.ndarray,    # bool [N]
    ) -> None:
        self._preds.append(
            dict(
                pred_masks=pred_masks[:, point_valid],
                pred_scores=pred_scores, pred_classes=pred_classes,
                pred_valid=pred_valid,
                gt_instance=gt_instance[point_valid], gt_classes=gt_classes,
            )
        )

    def _match_scene(self, scene: dict, iou_t: float):
        """Returns per-class lists of (score, tp) plus GT counts."""
        out = defaultdict(list)
        gt_count = defaultdict(int)
        gt_ids = np.unique(scene["gt_instance"])
        gt_ids = gt_ids[gt_ids >= 0]
        gt_masks = {g: scene["gt_instance"] == g for g in gt_ids}
        for g in gt_ids:
            c = int(scene["gt_classes"][g])
            if 0 <= c < self.num_classes:
                gt_count[c] += 1
        order = np.argsort(-scene["pred_scores"])
        matched = set()
        for p in order:
            if not scene["pred_valid"][p]:
                continue
            c = int(scene["pred_classes"][p])
            if not (0 <= c < self.num_classes):
                continue
            pm = scene["pred_masks"][p]
            if pm.sum() == 0:
                out[c].append((float(scene["pred_scores"][p]), 0))
                continue
            best_iou, best_g = 0.0, None
            for g in gt_ids:
                if g in matched or int(scene["gt_classes"][g]) != c:
                    continue
                gm = gt_masks[g]
                inter = np.logical_and(pm, gm).sum()
                union = np.logical_or(pm, gm).sum()
                iou = inter / max(union, 1)
                if iou > best_iou:
                    best_iou, best_g = iou, g
            if best_g is not None and best_iou >= iou_t:
                matched.add(best_g)
                out[c].append((float(scene["pred_scores"][p]), 1))
            else:
                out[c].append((float(scene["pred_scores"][p]), 0))
        return out, gt_count

    @staticmethod
    def _average_precision(scored: List, n_gt: int) -> float:
        if n_gt == 0:
            return float("nan")
        if not scored:
            return 0.0
        scored = sorted(scored, key=lambda x: -x[0])
        tp = np.cumsum([s[1] for s in scored])
        fp = np.cumsum([1 - s[1] for s in scored])
        recall = tp / n_gt
        precision = tp / np.maximum(tp + fp, 1)
        # all-point interpolation
        ap, prev_r = 0.0, 0.0
        for i in range(len(scored)):
            ap += (recall[i] - prev_r) * precision[i:].max()
            prev_r = recall[i]
        return float(ap)

    def compute(self) -> Dict[str, float]:
        results = {}
        for iou_t in self.iou_thresholds:
            per_class = defaultdict(list)
            gt_totals = defaultdict(int)
            for scene in self._preds:
                matches, counts = self._match_scene(scene, iou_t)
                for c, lst in matches.items():
                    per_class[c].extend(lst)
                for c, n in counts.items():
                    gt_totals[c] += n
            aps = []
            for c in range(self.num_classes):
                if gt_totals[c] == 0:
                    continue
                aps.append(self._average_precision(per_class[c], gt_totals[c]))
            key = f"mAP@{iou_t:g}"
            results[key] = float(np.mean(aps)) if aps else 0.0
        return results
