"""GSPMD data-parallel equivalence on the fake 8-device CPU mesh
(SURVEY.md §4 distributed tests): a sharded train step must match the
single-device step bit-for-bit-ish (fp tolerance for reduction order)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparse_rcnn_tpu.config import load_config
from sparse_rcnn_tpu.data import synthetic
from sparse_rcnn_tpu.parallel import (
    make_mesh, make_parallel_train_step, replicate_state, shard_batch,
)
from sparse_rcnn_tpu.train import loop as TL


@pytest.fixture(scope="module")
def cfg():
    return load_config(overrides={
        "data": {"num_points": 512, "voxel_capacity": 256, "batch_size": 8,
                  "voxel_size": [0.2, 0.2, 0.2]},
        "model": {
            "backbone": {"widths": [8, 16], "blocks_per_scale": 1},
            "rpn": {"hidden": 8, "num_proposals": 4, "pre_nms_topk": 16},
            "roi": {"grid_size": 3, "hidden": 8, "mask_grid": 6},
            "num_classes": 3, "max_instances": 6,
        },
    })


@pytest.fixture(scope="module")
def batch(cfg):
    b = synthetic.generate_batch(5, 8, num_points=cfg.data.num_points,
                                 num_instances=2,
                                 num_classes=cfg.model.num_classes)
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_eight_devices_visible():
    assert len(jax.devices()) == 8


def test_dp_step_matches_single_device(cfg, batch):
    state = TL.init_state(cfg, batch)

    # single device reference
    sstep = TL.make_train_step(cfg)
    s_ref, m_ref = sstep(jax.tree_util.tree_map(jnp.copy, state), batch)

    # 8-way data parallel
    mesh = make_mesh()
    pstate = replicate_state(jax.tree_util.tree_map(jnp.copy, state), mesh)
    pbatch = shard_batch(batch, mesh)
    pstep = make_parallel_train_step(cfg, mesh)
    s_par, m_par = pstep(pstate, pbatch)

    np.testing.assert_allclose(
        float(m_ref["total"]), float(m_par["total"]), rtol=1e-5
    )
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_par.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dp_batch_actually_sharded(cfg, batch):
    mesh = make_mesh()
    pbatch = shard_batch(batch, mesh)
    shard_counts = {len(pbatch["points"].sharding.device_set)}
    assert shard_counts == {8}


def test_dp_step_with_ema_matches_single_device(batch):
    """EMA update under GSPMD (plain tree_map outside shard_map) must track
    the single-device EMA exactly."""
    ecfg = load_config(overrides={
        "data": {"num_points": 512, "voxel_capacity": 256, "batch_size": 8,
                  "voxel_size": [0.2, 0.2, 0.2]},
        "model": {
            "backbone": {"widths": [8, 16], "blocks_per_scale": 1},
            "rpn": {"hidden": 8, "num_proposals": 4, "pre_nms_topk": 16},
            "roi": {"grid_size": 3, "hidden": 8, "mask_grid": 6},
            "num_classes": 3, "max_instances": 6,
        },
        "train": {"ema": 0.9},
    })
    state = TL.init_state(ecfg, batch)
    sstep = TL.make_train_step(ecfg)
    s_ref, _ = sstep(jax.tree_util.tree_map(jnp.copy, state), batch)

    mesh = make_mesh()
    pstate = replicate_state(jax.tree_util.tree_map(jnp.copy, state), mesh)
    pbatch = shard_batch(batch, mesh)
    pstep = make_parallel_train_step(ecfg, mesh)
    s_par, _ = pstep(pstate, pbatch)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.ema_params),
                    jax.tree_util.tree_leaves(s_par.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dp_eval_matches_single_device(cfg, batch):
    """The parallel EVAL step (the path quality numbers are quoted on) must
    produce the SAME per-scene outputs as the single-device step: the
    device-thresholded bit-packed masks bit-for-bit, scores/logits to fp
    tolerance (VERDICT r4 item 1 — this path had zero coverage)."""
    from sparse_rcnn_tpu.parallel import make_parallel_eval_step

    state = TL.init_state(cfg, batch)
    ref = TL.make_eval_step(cfg)(state, batch)

    mesh = make_mesh()
    pstate = replicate_state(state, mesh)
    pbatch = shard_batch(batch, mesh)
    par = make_parallel_eval_step(cfg, mesh)(pstate, pbatch)

    np.testing.assert_array_equal(
        np.asarray(ref["point_mask_bits"]), np.asarray(par["point_mask_bits"]))
    for key in ("proposal_scores", "cls_logits"):
        np.testing.assert_allclose(
            np.asarray(ref[key]), np.asarray(par[key]), rtol=1e-5, atol=1e-6)
    if "point_semantic_pred" in ref:
        np.testing.assert_array_equal(
            np.asarray(ref["point_semantic_pred"]),
            np.asarray(par["point_semantic_pred"]))
