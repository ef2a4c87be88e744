"""bfloat16 compute path + remat backbone: train a step, stay finite."""

import numpy as np
import jax.numpy as jnp
import pytest

from sparse_rcnn_tpu.config import load_config
from sparse_rcnn_tpu.data import synthetic
from sparse_rcnn_tpu.train import loop as TL


@pytest.mark.parametrize("dtype,remat", [("bfloat16", False), ("float32", True)])
def test_train_step_bf16_and_remat(dtype, remat):
    cfg = load_config(overrides={
        "data": {"num_points": 512, "voxel_capacity": 256, "batch_size": 2,
                  "voxel_size": [0.2, 0.2, 0.2]},
        "model": {
            "backbone": {"widths": [8, 16], "blocks_per_scale": 1,
                          "dtype": dtype, "remat": remat},
            "rpn": {"hidden": 8, "num_proposals": 4, "pre_nms_topk": 16},
            "roi": {"grid_size": 3, "hidden": 8, "mask_grid": 6},
            "num_classes": 3, "max_instances": 6,
        },
    })
    b = synthetic.generate_batch(9, 2, num_points=512, num_instances=2,
                                 num_classes=3)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    state = TL.init_state(cfg, batch)
    step = TL.make_train_step(cfg)
    for _ in range(2):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total"]))
    # params remain f32 master copies
    leaf = next(iter(
        x for x in __import__("jax").tree_util.tree_leaves(state.params)
    ))
    assert leaf.dtype == jnp.float32
