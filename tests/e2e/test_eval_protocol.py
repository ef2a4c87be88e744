"""Observability + eval-protocol tests (VERDICT r2 item 6).

(a) The dense tail silently zeroes features at sites outside grid_extent —
    the drop must be visible as a step-metric counter, like the capacity
    overflows (SURVEY.md §7 invariant 1).
(b) The eval Loader wrap-pads the last batch (data/pipeline.py); run_eval
    must score each scene exactly once when the split size does not divide
    the batch size.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_rcnn_tpu.config import load_config
from sparse_rcnn_tpu.data import synthetic
from sparse_rcnn_tpu.train import evaluate as E
from sparse_rcnn_tpu.train import loop as TL


def _cfg(grid_extent):
    return load_config(overrides={
        "data": {"num_points": 4096, "voxel_capacity": 4096, "batch_size": 2,
                  "voxel_size": [0.05] * 3},
        "model": {
            "backbone": {"widths": [8, 16], "blocks_per_scale": 1,
                          "dense_from_scale": 1, "grid_extent": grid_extent},
            "rpn": {"hidden": 8, "num_proposals": 8, "pre_nms_topk": 32},
            "roi": {"grid_size": 4, "hidden": 8, "mask_grid": 8},
            "num_classes": 6, "max_instances": 8,
        },
        "train": {"warmup_steps": 1, "total_steps": 10},
    })


def _batch(cfg, seed):
    b = synthetic.generate_batch(
        seed, cfg.data.batch_size, num_points=cfg.data.num_points,
        num_instances=4, num_classes=cfg.model.num_classes,
    )
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_dense_tail_oob_counter_fires_and_clears():
    # synthetic scenes span ~8m = 160 voxels at 5cm; a 16-voxel extent drops
    # most scale-1 sites, a 256-voxel extent drops none.
    small, big = _cfg([16, 16, 16]), _cfg([256, 256, 256])
    batch = _batch(small, 0)

    state = TL.init_state(small, batch)
    _, metrics = TL.make_train_step(small)(state, batch)
    assert int(metrics["dense_tail_oob"]) > 0
    assert np.isfinite(float(metrics["total"]))  # degrade, never crash

    state = TL.init_state(big, batch)
    _, metrics = TL.make_train_step(big)(state, batch)
    assert int(metrics["dense_tail_oob"]) == 0


def test_eval_scores_each_scene_exactly_once_with_wrap_pad():
    cfg = _cfg([256, 256, 256])
    b = cfg.data.batch_size
    n = 3
    assert n % b != 0  # the broken case: last batch wraps to scene 0
    scenes = [synthetic.generate_scene(
        s, num_points=cfg.data.num_points, num_instances=4,
        num_classes=cfg.model.num_classes) for s in range(n)]

    def collate(idxs):
        return {k: jnp.asarray(np.stack([scenes[i % n][k] for i in idxs]))
                for k in scenes[0]}

    batches = [collate([0, 1]), collate([2, 3])]  # scene 0 appears twice
    state = TL.init_state(cfg, batches[0])
    res = E.run_eval(cfg, state, batches, num_scenes=n)
    assert res["scenes"] == n
    # without the split size, the duplicate is (wrongly) scored again
    res_dup = E.run_eval(cfg, state, batches)
    assert res_dup["scenes"] == n + 1


def test_fetch_eval_outputs_is_selective_and_exact():
    """(c) Eval transfer contract (BASELINE round-4 eval-transfer note):
    fetch_eval_outputs must NOT materialize the [B, P, N] f32 mask logits
    or the GT struct on host, must record the point count for the
    bit-unpack slice, and the bit-path masks must equal logits > 0."""
    cfg = _cfg([256, 256, 256])
    batch = _batch(cfg, 0)
    state = TL.init_state(cfg, batch)
    step = TL.make_eval_step(cfg)
    raw = step(state, batch)
    out = E.fetch_eval_outputs(raw)
    assert "point_mask_logits" not in out and "gt" not in out
    assert out["point_mask_n"] == raw["point_mask_logits"].shape[-1]
    for k, v in out.items():
        if k != "point_mask_n":
            assert isinstance(v, np.ndarray), (k, type(v))
    for b in range(cfg.data.batch_size):
        masks, _, _, _ = E.postprocess_scene(out, b, cfg.model.num_classes)
        ref = np.asarray(raw["point_mask_logits"][b]) > 0.0
        np.testing.assert_array_equal(masks, ref)
    # non-default threshold path still works from the RAW step output
    masks2, _, _, _ = E.postprocess_scene(
        jax.device_get(raw), 0, cfg.model.num_classes, mask_threshold=0.9)
    assert masks2.sum() <= (np.asarray(raw["point_mask_logits"][0]) > 0).sum()
