"""End-to-end training smoke, determinism, and checkpoint-resume tests
(SURVEY.md §4: integration + determinism)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparse_rcnn_tpu.config import load_config
from sparse_rcnn_tpu.data import synthetic
from sparse_rcnn_tpu.train import loop as TL
from sparse_rcnn_tpu.train import checkpoint as CK


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    return load_config(overrides={
        "data": {"num_points": 1024, "voxel_capacity": 512, "batch_size": 2,
                  "voxel_size": [0.15, 0.15, 0.15]},
        "model": {
            "backbone": {"widths": [8, 16], "blocks_per_scale": 1},
            "rpn": {"hidden": 16, "num_proposals": 8, "pre_nms_topk": 32},
            "roi": {"grid_size": 4, "hidden": 16, "mask_grid": 8},
            "num_classes": 4, "max_instances": 8,
        },
        "train": {"lr": 3e-3, "warmup_steps": 2, "total_steps": 50},
    })


@pytest.fixture(scope="module")
def batch(cfg):
    b = synthetic.generate_batch(3, cfg.data.batch_size,
                                 num_points=cfg.data.num_points,
                                 num_instances=3,
                                 num_classes=cfg.model.num_classes)
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_overfit_single_batch(cfg, batch):
    state = TL.init_state(cfg, batch)
    step = TL.make_train_step(cfg)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total"]))
    assert all(np.isfinite(losses))
    # overfitting one batch must reduce the loss
    assert losses[-1] < losses[0], losses


def test_determinism_same_seed(cfg, batch):
    step = TL.make_train_step(cfg)
    s1 = TL.init_state(cfg, batch)
    s2 = TL.init_state(cfg, batch)
    for _ in range(2):
        s1, m1 = step(s1, batch)
        s2, m2 = step(s2, batch)
    assert float(m1["total"]) == float(m2["total"])
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip(cfg, batch, tmp_path):
    state = TL.init_state(cfg, batch)
    step = TL.make_train_step(cfg)
    state, _ = step(state, batch)
    mgr = CK.make_manager(str(tmp_path / "ckpt"), keep=2)
    CK.save(mgr, state)
    mgr.wait_until_finished()
    template = jax.tree_util.tree_map(np.zeros_like, TL.init_state(cfg, batch))
    restored = CK.restore(mgr, template)
    assert restored is not None
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_step_outputs(cfg, batch):
    state = TL.init_state(cfg, batch)
    estep = TL.make_eval_step(cfg)
    out = estep(state, batch)
    p = cfg.model.rpn.num_proposals
    n = cfg.data.num_points
    assert out["point_mask_logits"].shape == (2, p, n)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()


def test_multiscale_rpn_train_step(cfg, batch):
    import dataclasses
    from sparse_rcnn_tpu.config import load_config
    mcfg = load_config(overrides={
        "data": {"num_points": 1024, "voxel_capacity": 512, "batch_size": 2,
                  "voxel_size": [0.15, 0.15, 0.15]},
        "model": {
            "backbone": {"widths": [8, 16], "blocks_per_scale": 1},
            "rpn": {"hidden": 16, "num_proposals": 8, "pre_nms_topk": 32,
                     "rpn_scales": [0, 1]},
            "roi": {"grid_size": 4, "hidden": 16, "mask_grid": 8},
            "num_classes": 4, "max_instances": 8,
        },
        "train": {"lr": 3e-3, "warmup_steps": 2, "total_steps": 50},
    })
    state = TL.init_state(mcfg, batch)
    step = TL.make_train_step(mcfg)
    s2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total"]))
    # eval path runs too
    out = TL.make_eval_step(mcfg)(s2, batch)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()


def test_checkpoint_restores_pre_ema_format(cfg, batch, tmp_path):
    """Checkpoints written before the ema_params field existed (a 5-key
    tree: step/params/batch_stats/opt_state/rng) must keep restoring with
    EMA-off configs — optional None fields may not leak into the on-disk
    structure (checkpoint._as_tree)."""
    import orbax.checkpoint as ocp

    state = TL.init_state(cfg, batch)
    assert state.ema_params is None
    old_tree = {
        "step": state.step, "params": state.params,
        "batch_stats": state.batch_stats, "opt_state": state.opt_state,
        "rng": state.rng,
    }  # exactly the pre-EMA on-disk layout
    mgr = CK.make_manager(str(tmp_path / "old_ckpt"), keep=1)
    mgr.save(0, args=ocp.args.StandardSave(old_tree))
    mgr.wait_until_finished()
    restored = CK.restore(mgr, state)
    assert restored is not None and restored.ema_params is None
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_params_track_and_checkpoint(batch, tmp_path):
    """train.ema > 0: ema_params smooth toward params, the eval step uses
    them, and they roundtrip through checkpoints."""
    ecfg = load_config(overrides={
        "data": {"num_points": 1024, "voxel_capacity": 512, "batch_size": 2,
                  "voxel_size": [0.15, 0.15, 0.15]},
        "model": {
            "backbone": {"widths": [8, 16], "blocks_per_scale": 1},
            "rpn": {"hidden": 16, "num_proposals": 8, "pre_nms_topk": 32},
            "roi": {"grid_size": 4, "hidden": 16, "mask_grid": 8},
            "num_classes": 4, "max_instances": 8,
        },
        "train": {"lr": 3e-3, "warmup_steps": 2, "total_steps": 50,
                   "ema": 0.99},
    })
    state = TL.init_state(ecfg, batch)
    assert state.ema_params is not None
    step = TL.make_train_step(ecfg)
    for _ in range(3):
        state, _ = step(state, batch)
    diffs = [float(jnp.abs(e.astype(jnp.float32) - p.astype(jnp.float32)).max())
             for e, p in zip(jax.tree_util.tree_leaves(state.ema_params),
                             jax.tree_util.tree_leaves(state.params))]
    assert any(d > 0 for d in diffs), "EMA should lag the raw params"
    # debias ramp: at step ~3 the effective decay is small, so the EMA
    # must be far closer to params than to the init
    out = TL.make_eval_step(ecfg)(state, batch)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()
    mgr = CK.make_manager(str(tmp_path / "ema_ckpt"), keep=1)
    CK.save(mgr, state)
    mgr.wait_until_finished()
    template = jax.tree_util.tree_map(np.zeros_like, state)
    restored = CK.restore(mgr, template)
    for a, b in zip(jax.tree_util.tree_leaves(restored.ema_params),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("downsample", ["maxpool", "avgpool"])
def test_pooling_downsample_and_dropout(downsample):
    """Config-wired pooling downsample + dropout (SURVEY.md C6/C8): trains,
    stays finite, and is deterministic (dropout rng lives in TrainState)."""
    cfg = load_config(overrides={
        "data": {"num_points": 1024, "voxel_capacity": 512, "batch_size": 2,
                  "voxel_size": [0.15, 0.15, 0.15]},
        "model": {
            "backbone": {"widths": [8, 16], "blocks_per_scale": 1,
                          "downsample": downsample, "dropout": 0.2},
            "rpn": {"hidden": 16, "num_proposals": 8, "pre_nms_topk": 32},
            "roi": {"grid_size": 4, "hidden": 16, "mask_grid": 8},
            "num_classes": 4, "max_instances": 8,
        },
        "train": {"lr": 3e-3, "warmup_steps": 2, "total_steps": 50},
    })
    b = synthetic.generate_batch(3, cfg.data.batch_size,
                                 num_points=cfg.data.num_points,
                                 num_instances=3,
                                 num_classes=cfg.model.num_classes)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    step = TL.make_train_step(cfg)
    s1 = TL.init_state(cfg, batch)
    s2 = TL.init_state(cfg, batch)
    for _ in range(2):
        s1, m1 = step(s1, batch)
        s2, m2 = step(s2, batch)
    assert np.isfinite(float(m1["total"]))
    assert float(m1["total"]) == float(m2["total"])  # rng is in the state
    # eval (dropout inert) runs clean
    out = TL.make_eval_step(cfg)(s1, batch)
    assert np.isfinite(np.asarray(out["cls_logits"], np.float32)).all()


def test_eval_device_thresholded_masks_match_logits(cfg, batch):
    """point_mask_bits (device-thresholded + bit-packed, the evaluator's
    fetch path) must unpack to exactly the host-thresholded f32 logits at
    sigmoid 0.5 — including the postprocess_scene slice-to-N path."""
    from sparse_rcnn_tpu.train.evaluate import postprocess_scene

    state = TL.init_state(cfg, batch)
    out = TL.make_eval_step(cfg)(state, batch)
    n = out["point_mask_logits"].shape[-1]
    unpacked = np.unpackbits(
        np.asarray(out["point_mask_bits"]), axis=-1)[..., :n] > 0
    np.testing.assert_array_equal(
        unpacked, np.asarray(out["point_mask_logits"]) > 0.0)
    # the evaluator path and the logits path agree per scene
    m_bits, s1, c1, v1 = postprocess_scene(out, 0, 4)
    m_log, s2, c2, v2 = postprocess_scene(
        {k: v for k, v in out.items() if k != "point_mask_bits"}, 0, 4)
    np.testing.assert_array_equal(m_bits, m_log)
