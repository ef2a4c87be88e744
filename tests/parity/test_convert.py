"""Backbone execution-form conversion (models/convert.py).

Round-trip exactness plus the per-mode knob end to end: a state trained in
the dense-3 form must evaluate IDENTICALLY (up to float tolerance) through
the converted dense-2/dense-1 eval path — the dense tail is an execution
strategy, not architecture (tests/parity/test_dense_tail.py is the
underlying sparse≡dense oracle; this file tests moving the boundary).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_rcnn_tpu.config import load_config
from sparse_rcnn_tpu.data import synthetic
from sparse_rcnn_tpu.models.convert import (
    convert_backbone, to_dense, to_sparse, tree_boundary,
)
from sparse_rcnn_tpu.models.unet import SparseUNet
from tests.parity.test_dense_tail import WIDTHS, _inputs


def _tree_allclose(a, b):
    ja = jax.tree_util.tree_leaves_with_path(a)
    jb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(ja) == len(jb)
    for path, leaf in ja:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(jb[path]), rtol=0, atol=0,
            err_msg=str(path))


def test_roundtrip_exact():
    st, scales = _inputs()
    net = SparseUNet(widths=WIDTHS, blocks_per_scale=2)
    vs = net.init(jax.random.PRNGKey(0), st.feats, scales, False)
    for tree in (dict(vs["params"]), dict(vs["batch_stats"])):
        for s0 in (1, 2):
            dense = to_dense(dict(tree), s0)
            assert tree_boundary(dense) == s0
            back = to_sparse(dense)
            assert tree_boundary(back) is None
            _tree_allclose(tree, back)
        # boundary moves compose: sparse -> dense2 -> dense1 -> sparse
        moved = convert_backbone(convert_backbone(dict(tree), 2), 1)
        assert tree_boundary(moved) == 1
        _tree_allclose(tree, convert_backbone(moved, None))


def test_per_mode_dense_from_scale_eval_parity():
    """init_state under dense_from_scale_train produces TRAIN-form params;
    eval_step converts them and must match evaluating the same state with
    the train form directly (mathematical equivalence of tail boundaries)."""
    from sparse_rcnn_tpu.train import loop as TL

    overrides = {
        "data": {"num_points": 4096, "voxel_capacity": 4096, "batch_size": 2,
                 "voxel_size": [0.05] * 3},
        "model": {"backbone": {"widths": list(WIDTHS), "blocks_per_scale": 1,
                               "dense_from_scale": 1,
                               "dense_from_scale_train": 2,
                               "grid_extent": [64, 64, 64]},
                  "rpn": {"hidden": 8, "num_proposals": 8,
                          "pre_nms_topk": 32, "rpn_scales": [0, 1]},
                  "roi": {"grid_size": 4, "hidden": 8, "mask_grid": 8},
                  "num_classes": 5, "max_instances": 8},
        "train": {"warmup_steps": 1, "total_steps": 10},
    }
    cfg = load_config(overrides=overrides)
    b = synthetic.generate_batch(0, 2, num_points=4096, num_instances=4,
                                 num_classes=5, extent=3.0)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    state = TL.init_state(cfg, batch)
    # params live in the TRAIN form (dense tail from scale 2)
    tail = state.params["backbone"]["dense_tail"]
    assert "enc2_block0" in tail and "enc1_block0" not in tail

    out_conv = TL.make_eval_step(cfg)(state, batch)

    # control: evaluate the SAME state with the train form as the eval form
    ctrl = dict(overrides)
    import copy

    ctrl = copy.deepcopy(overrides)
    ctrl["model"]["backbone"]["dense_from_scale"] = 2
    ctrl["model"]["backbone"]["dense_from_scale_train"] = None
    out_direct = TL.make_eval_step(load_config(overrides=ctrl))(state, batch)

    for key in ("proposal_scores", "cls_logits", "point_mask_logits"):
        np.testing.assert_allclose(
            np.asarray(out_conv[key]), np.asarray(out_direct[key]),
            rtol=2e-3, atol=2e-3, err_msg=key)

    # and one train step in the per-mode config runs with a finite loss
    state2, metrics = TL.make_train_step(cfg)(state, batch)
    assert np.isfinite(float(metrics["total"]))
