"""Gradient accumulation (train.grad_accum_steps, optax.MultiSteps).

Semantics pinned here:
  * params are FROZEN on mini-steps and update exactly every k-th call,
  * the k-th update equals the k=1 update on the mean of the micro-grads
    (checked via the strongest available oracle: feeding the SAME batch k
    times makes the mean the single-batch grad, so the accumulated update
    must match the plain optimizer bit-for-bit),
  * the EMA smooths once per APPLIED update, not once per micro-step,
  * the LR schedule advances in optimizer updates (micro-steps / k).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_rcnn_tpu.config import load_config
from sparse_rcnn_tpu.data import synthetic
from sparse_rcnn_tpu.train import loop as TL


def _cfg(accum, ema=0.0):
    return load_config(overrides={
        "data": {"num_points": 1024, "voxel_capacity": 512, "batch_size": 2,
                 "voxel_size": [0.15, 0.15, 0.15]},
        "model": {
            "backbone": {"widths": [8, 16], "blocks_per_scale": 1},
            "rpn": {"hidden": 16, "num_proposals": 8, "pre_nms_topk": 32},
            "roi": {"grid_size": 4, "hidden": 16, "mask_grid": 8},
            "num_classes": 4, "max_instances": 8,
        },
        "train": {"lr": 3e-3, "warmup_steps": 0, "total_steps": 50,
                  "grad_accum_steps": accum, "ema": ema},
    })


def _batch(cfg):
    b = synthetic.generate_batch(3, cfg.data.batch_size,
                                 num_points=cfg.data.num_points,
                                 num_instances=3,
                                 num_classes=cfg.model.num_classes)
    return {k: jnp.asarray(v) for k, v in b.items()}


def _flat(tree):
    return np.concatenate([
        np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(tree)
    ])


def test_accum_freezes_params_then_matches_plain_update():
    cfg2 = _cfg(2, ema=0.9)
    batch = _batch(cfg2)
    state = TL.init_state(cfg2, batch)
    p0 = _flat(state.params)
    ema0 = _flat(state.ema_params)
    step2 = TL.make_train_step(cfg2)

    state, m1 = step2(state, batch)
    # mini-step: grads accumulated, params and EMA untouched
    assert np.array_equal(_flat(state.params), p0)
    assert np.array_equal(_flat(state.ema_params), ema0)
    assert int(state.step) == 1
    state, m2 = step2(state, batch)
    p_accum = _flat(state.params)
    assert not np.array_equal(p_accum, p0)      # k-th call applied
    assert not np.array_equal(_flat(state.ema_params), ema0)

    # oracle: same batch twice -> mean grad == single grad, BN train-mode
    # normalization ignores running stats, dropout off => the accumulated
    # update must equal one plain (k=1) step at the same LR. lr schedules
    # agree at this point because warmup=0 and both are at update #0.
    cfg1 = _cfg(1, ema=0.9)
    state1 = TL.init_state(cfg1, batch)
    assert np.array_equal(_flat(state1.params), p0)  # same seed, same init
    state1, _ = TL.make_train_step(cfg1)(state1, batch)
    np.testing.assert_allclose(
        p_accum, _flat(state1.params), rtol=0, atol=1e-6)


def test_schedule_counts_optimizer_updates():
    cfg = _cfg(4)
    sched = TL.make_schedule(cfg)
    # 50 micro-steps / 4 = 12 updates; cosine must reach its floor at the
    # last UPDATE, not at micro-step 50
    end = float(sched(12))
    assert end == pytest.approx(cfg.train.lr * 0.01, rel=1e-3)


def test_validate_rejects_bad_accum():
    with pytest.raises(ValueError):
        _cfg(0)
