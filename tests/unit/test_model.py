"""End-to-end model construction + forward shape/grad tests on tiny scenes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_rcnn_tpu.config import Config, load_config
from sparse_rcnn_tpu.data import build_scene_gt, synthetic
from sparse_rcnn_tpu.models import SparseRCNN, paint_instance_masks, rpn_targets, roi_targets
from sparse_rcnn_tpu.models import losses as L
from sparse_rcnn_tpu.ops import hierarchy as H
from sparse_rcnn_tpu.ops import voxelize as V


@pytest.fixture(scope="module")
def tiny_cfg():
    return load_config(overrides={
        "data": {"num_points": 2048, "voxel_capacity": 1024, "batch_size": 2,
                  "voxel_size": [0.1, 0.1, 0.1]},
        "model": {
            "backbone": {"widths": [8, 16], "blocks_per_scale": 1},
            "rpn": {"hidden": 16, "num_proposals": 8, "pre_nms_topk": 32},
            "roi": {"grid_size": 4, "hidden": 16, "mask_grid": 8},
            "num_classes": 5, "max_instances": 8,
        },
    })


@pytest.fixture(scope="module")
def batch(tiny_cfg):
    return synthetic.generate_batch(
        1, tiny_cfg.data.batch_size, num_points=tiny_cfg.data.num_points,
        num_instances=4, num_classes=tiny_cfg.model.num_classes,
    )


@pytest.fixture(scope="module")
def pipeline_state(tiny_cfg, batch):
    cfg = tiny_cfg
    st, p2v, ovf = V.voxelize_batch(
        jnp.asarray(batch["points"]), jnp.asarray(batch["feats"]),
        jnp.asarray(batch["valid"]), jnp.asarray(cfg.data.voxel_size),
        cfg.data.voxel_capacity,
    )
    scales, hovf = H.build_hierarchy(
        st, len(cfg.model.backbone.widths), cfg.scale_capacities(),
    )
    gt = build_scene_gt(
        jnp.asarray(batch["points"]), jnp.asarray(batch["valid"]),
        jnp.asarray(batch["point_instance"]), jnp.asarray(batch["point_semantic"]),
        p2v, cfg.data.voxel_capacity, jnp.asarray(cfg.data.voxel_size),
        cfg.model.max_instances,
    )
    return st, p2v, scales, gt


def test_hierarchy_shapes(tiny_cfg, pipeline_state):
    st, _, scales, _ = pipeline_state
    caps = tiny_cfg.scale_capacities()
    assert len(scales) == 2
    assert scales[0].coords.shape == (2, caps[0], 3)
    assert scales[0].subm_idx.shape == (2, 27, caps[0])
    assert scales[0].down_idx.shape == (2, 8, caps[1])
    assert scales[0].up_idx.shape == (2, 8, caps[0])
    assert scales[1].down_idx is None
    # coarse scale has fewer sites than fine
    assert (np.asarray(scales[1].nvalid) <= np.asarray(scales[0].nvalid)).all()
    assert (np.asarray(scales[1].nvalid) > 0).all()


def test_gt_builder(tiny_cfg, batch, pipeline_state):
    _, _, _, gt = pipeline_state
    gtv = np.asarray(gt.valid)
    # synthetic scenes have >= 2 instances
    assert gtv.sum(1).min() >= 2
    boxes = np.asarray(gt.boxes)
    sizes = boxes[..., 3:] - boxes[..., :3]
    assert (sizes[gtv] > 0).all()
    classes = np.asarray(gt.classes)
    assert (classes[gtv] >= 0).all() and (classes[gtv] < tiny_cfg.model.num_classes).all()
    # voxel instance labels: every valid instance id in range
    vinst = np.asarray(gt.voxel_instance)
    assert vinst.max() < tiny_cfg.model.max_instances and vinst.min() >= -1


def test_model_forward_and_losses(tiny_cfg, pipeline_state):
    cfg = tiny_cfg
    st, _, scales, gt = pipeline_state
    model = SparseRCNN(cfg.model)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, st.feats, scales, train=False)
    out = model.apply(variables, st.feats, scales, train=False)

    b, p = 2, cfg.model.rpn.num_proposals
    g = cfg.model.roi.grid_size * 2
    assert out["cls_logits"].shape == (b, p, cfg.model.num_classes + 1)
    assert out["mask_logits"].shape == (b, p, g, g, g)
    assert out["proposals"].shape == (b, p, 6)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()

    # losses are finite and respond to targets
    rt = rpn_targets(scales[0].coords,
                     np.asarray(scales[0].coords.shape[1]) and
                     (jnp.arange(scales[0].coords.shape[1])[None] < scales[0].nvalid[:, None]),
                     gt, cfg.model.rpn.box_norm, 1)
    obj_l, box_l = L.rpn_loss(out["rpn_obj"][0], out["rpn_deltas"][0], rt)
    tt = roi_targets(out["crop_boxes"], out["proposal_mask"],
                     scales[0].coords, scales[0].nvalid, gt, cfg.model)
    cls_l = L.roi_cls_loss(out["cls_logits"], tt)
    vox_logits_raw, _ = paint_instance_masks(out, scales, masked=False)
    mask_l = L.roi_mask_loss(vox_logits_raw, tt)
    sem_l = L.semantic_loss(out["semantic_logits"], gt.voxel_semantic,
                            st.row_mask, cfg.model.num_classes)
    for name, val in [("obj", obj_l), ("box", box_l), ("cls", cls_l),
                      ("mask", mask_l), ("sem", sem_l)]:
        assert np.isfinite(float(val)), name

    # paint instance masks at inference
    vox_logits, inside = paint_instance_masks(out, scales)
    assert vox_logits.shape == (b, p, st.capacity)


def test_model_grads_flow(tiny_cfg, pipeline_state):
    cfg = tiny_cfg
    st, _, scales, gt = pipeline_state
    model = SparseRCNN(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), st.feats, scales, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def loss_fn(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            st.feats, scales, train=True, mutable=["batch_stats"],
        )
        mask0 = jnp.arange(st.capacity)[None] < scales[0].nvalid[:, None]
        rt = rpn_targets(scales[0].coords, mask0, gt, cfg.model.rpn.box_norm, 1)
        obj_l, box_l = L.rpn_loss(out["rpn_obj"][0], out["rpn_deltas"][0], rt)
        tt = roi_targets(out["crop_boxes"], out["proposal_mask"],
                         scales[0].coords, scales[0].nvalid, gt, cfg.model)
        vox_logits_raw, _ = paint_instance_masks(out, scales, masked=False)
        parts = {"rpn_obj": obj_l, "rpn_box": box_l,
                 "roi_cls": L.roi_cls_loss(out["cls_logits"], tt),
                 "roi_mask": L.roi_mask_loss(vox_logits_raw, tt)}
        return L.total_loss(parts, (1.0, 1.0, 1.0, 1.0))

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least the backbone stem must receive nonzero grad
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0
