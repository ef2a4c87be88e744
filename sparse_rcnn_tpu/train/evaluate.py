"""Validation driver: run the eval split, compute instance mAP on points
(SURVEY.md §3.2 — predictions are devoxelized to points before scoring)."""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..utils.metrics import InstanceAPEvaluator, SemanticMIoUEvaluator
from . import loop as TL


def _gt_classes_from_points(
    pinst: np.ndarray, psem: np.ndarray, valid: np.ndarray
) -> np.ndarray:
    """Class per GT instance id (index = id) from per-point labels: the max
    semantic label among the instance's valid points (matches data/gt.py's
    device-side segment-max derivation bit-for-bit)."""
    pi = pinst[valid]
    ps = psem[valid]
    keep = pi >= 0
    pi, ps = pi[keep], ps[keep]
    if pi.size == 0:
        return np.zeros((0,), np.int64)
    out = np.full(int(pi.max()) + 1, -1, np.int64)
    np.maximum.at(out, pi, ps)
    return out


def fetch_eval_outputs(out) -> Dict[str, np.ndarray]:
    """Selectively fetch an eval_step result dict to host.

    The full [B, P, N] f32 point_mask_logits (268 MB/batch at the 2cm
    shape) and the GT struct are NOT fetched — the bit-packed masks carry
    the same booleans 32x smaller. A blanket device_get(out) pulls them
    through the tunnel anyway and dominates eval wall (~6.5 s/scene vs
    ~0.6 s device compute — BASELINE.md round-4 eval-transfer note). The
    logits array is dropped entirely (holding its device buffer across
    the next step would add a full logits allocation to eval peak HBM);
    only its point-count is kept for the bit-unpack slice. Callers that
    need a non-default mask_threshold must postprocess the raw step
    output instead of this helper's result."""
    host = jax.device_get({k: v for k, v in out.items()
                           if k not in ("point_mask_logits", "gt")})
    host["point_mask_n"] = int(out["point_mask_logits"].shape[-1])
    return host


def postprocess_scene(
    out: Dict[str, np.ndarray], b: int, num_classes: int,
    mask_threshold: float = 0.5,
):
    """Per-scene predictions for the evaluator from eval_step outputs."""
    pmask = np.asarray(out["proposal_mask"][b])
    cls_logits = np.asarray(out["cls_logits"][b])
    cls_prob = np.exp(cls_logits - cls_logits.max(-1, keepdims=True))
    cls_prob = cls_prob / cls_prob.sum(-1, keepdims=True)
    fg_prob = cls_prob[:, :num_classes]
    pred_cls = fg_prob.argmax(-1)
    obj = 1 / (1 + np.exp(-np.clip(np.asarray(out["proposal_scores"][b]), -30, 30)))
    scores = fg_prob.max(-1) * obj
    if mask_threshold == 0.5 and "point_mask_bits" in out:
        # device-thresholded bit-packed path: never pull the f32 logits
        # (fetch_eval_outputs drops them and records only the point count)
        n = (out["point_mask_n"] if "point_mask_n" in out
             else out["point_mask_logits"].shape[-1])
        masks = np.unpackbits(
            np.asarray(out["point_mask_bits"][b]), axis=-1)[:, :n] > 0
    else:
        point_logits = np.asarray(out["point_mask_logits"][b])  # [P, N]
        masks = point_logits > np.log(mask_threshold / (1 - mask_threshold))
    return masks, scores, pred_cls, pmask


def run_eval(
    cfg: Config,
    state,
    loader,
    max_batches: Optional[int] = None,
    eval_step=None,
    num_scenes: Optional[int] = None,
    per_class: bool = False,
    per_scene: bool = False,
) -> Dict[str, float]:
    """Score ``loader``'s batches. ``num_scenes`` (the eval split size) makes
    the wrap-padded tail of the last batch score each scene exactly once:
    the eval Loader pads ``n % batch_size`` by wrapping to the split's start
    (data/pipeline.py), so without it those duplicates would be counted
    twice (mAP and the scene count both wrong whenever the split size does
    not divide the batch size — e.g. ScanNet val = 312)."""
    t_pass = time.perf_counter()
    ev = InstanceAPEvaluator(cfg.model.num_classes)
    sem_ev = SemanticMIoUEvaluator(cfg.model.num_classes + 1)
    out = None  # set by the first scored batch
    step = eval_step or TL.make_eval_step(cfg)
    if num_scenes is None:
        ds = getattr(loader, "dataset", None)
        num_scenes = len(ds) if ds is not None else None
    seen = 0
    t_dev = t_fetch = t_host = 0.0

    def _score(out, batch, bi):
        nonlocal seen, t_host
        t0 = time.perf_counter()
        for b in range(cfg.data.batch_size):
            if num_scenes is not None and bi * cfg.data.batch_size + b >= num_scenes:
                break  # wrap-pad duplicate (ordered eval pass) — already scored
            masks, scores, pred_cls, pmask = postprocess_scene(
                out, b, cfg.model.num_classes
            )
            point_valid = np.asarray(batch["valid"][b])
            pinst = np.asarray(batch["point_instance"][b])
            # GT classes per instance id from the RAW point labels, not the
            # capacity-capped device GT (gt.classes stops at max_instances;
            # per-point ids don't, and a scene with more instances than the
            # target capacity must still SCORE all of them — over-capacity
            # instances count as unmatched GT, an honest recall hit, instead
            # of crashing or silently vanishing). Same semantics as
            # data/gt.py: class = segment-max of point semantics per id.
            gt_cls = _gt_classes_from_points(
                pinst, np.asarray(batch["point_semantic"][b]), point_valid)
            ev.add_scene(masks, scores, pred_cls, pmask, pinst, gt_cls, point_valid)
            if "point_semantic_pred" in out:
                sem_ev.add(
                    np.asarray(out["point_semantic_pred"][b])[point_valid],
                    np.asarray(batch["point_semantic"][b])[point_valid],
                )
            seen += 1
        t_host += time.perf_counter() - t0

    # One-batch lookahead (VERDICT r4 weak 3: step→block→fetch→score in
    # strict sequence idled the device through ~13.7 s of host scoring per
    # 32-scene pass): batch i+1 is DISPATCHED (async) before batch i is
    # scored, so host scoring overlaps the device compute of the next
    # batch. Accumulation order into the evaluators is unchanged — scoring
    # still runs strictly in batch order, one batch behind the device.
    # The i-th step's device buffers (incl. the [B,P,N] f32 logits) are
    # dropped right after the selective fetch, BEFORE dispatching step
    # i+1, so eval peak HBM never holds two logits allocations.
    pending = None  # (fetched outputs, host batch, batch index)
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        # (gt is unused here — the evaluator scores against RAW point
        # labels below)
        raw = step(state, batch)  # async dispatch — device starts now
        if pending is not None:
            _score(*pending)  # overlaps the device compute dispatched above
            pending = None
        t1 = time.perf_counter()
        jax.block_until_ready(raw["proposal_scores"])  # residual device time
        t2 = time.perf_counter()
        out = fetch_eval_outputs(raw)
        raw = None  # drop device logits before the next dispatch
        t_dev += t2 - t1
        t_fetch += time.perf_counter() - t2
        pending = (out, batch, bi)
    if pending is not None:
        _score(*pending)
    res = ev.compute(per_class=per_class)
    if per_scene:
        # scene-level mAP@0.5 spread: the error bar on the split number
        # (diagnoses eval-subset sensitivity — VERDICT r3 item 1)
        ps = np.asarray(ev.per_scene_map(0.5), np.float64)
        finite = ps[np.isfinite(ps)]
        if finite.size:
            res["scene_map50_mean"] = float(finite.mean())
            res["scene_map50_std"] = float(finite.std())
            res["scene_map50_min"] = float(finite.min())
            res["scene_map50_max"] = float(finite.max())
        # None for scenes with no scoreable GT (NaN would render as bare
        # `NaN` in the jsonl line — invalid strict JSON)
        res["per_scene_mAP@0.5"] = [
            round(float(x), 4) if np.isfinite(x) else None for x in ps]
    if out is not None and "point_semantic_pred" in out:
        sem = sem_ev.compute()
        res["semantic_mIoU"] = sem["mIoU"]
        res["semantic_acc"] = sem["accuracy"]
    res["scenes"] = seen
    # eval-pass wall + its split (device compute / host transfer / host
    # scoring): first-class in the jsonl so eval cost regressions are
    # visible — and attributable — in every quality log.
    # NOTE: the FIRST pass of a process includes the eval step's jit
    # trace+compile (minutes through the tunnel) in eval_dev_s; compare
    # steady points. With the lookahead, eval_dev_s is the device time NOT
    # hidden behind host scoring (the residual block time) — a
    # well-overlapped pass has eval_wall_s ≈ eval_dev_s + eval_fetch_s +
    # (host scoring of the final batch).
    res["eval_wall_s"] = round(time.perf_counter() - t_pass, 2)
    res["eval_dev_s"] = round(t_dev, 2)
    res["eval_fetch_s"] = round(t_fetch, 2)
    res["eval_host_s"] = round(t_host, 2)
    return res
