"""Golden-output regression ("bit-for-class", SURVEY.md §4 integration):
fixed seed + fixed scene → per-point instance/class assignments must be
reproduced exactly. Regenerate with `python tests/e2e/test_golden.py`
after *intentional* model/executor changes (the diff then documents the
behavior change)."""

import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_config1.npz")


def _compute():
    import jax
    import jax.numpy as jnp

    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data import synthetic
    from sparse_rcnn_tpu.train import loop as TL
    from sparse_rcnn_tpu.train.evaluate import postprocess_scene

    cfg = load_config(overrides={
        "data": {"num_points": 1024, "voxel_capacity": 512, "batch_size": 1,
                  "voxel_size": [0.12, 0.12, 0.12]},
        "model": {
            "backbone": {"widths": [8, 16], "blocks_per_scale": 1},
            "rpn": {"hidden": 16, "num_proposals": 8, "pre_nms_topk": 32},
            "roi": {"grid_size": 4, "hidden": 16, "mask_grid": 8},
            "num_classes": 4, "max_instances": 8,
        },
    })
    b = synthetic.generate_batch(11, 1, num_points=1024, num_instances=3,
                                 num_classes=4)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    state = TL.init_state(cfg, batch)
    out = jax.device_get(TL.make_eval_step(cfg)(state, batch))
    masks, scores, pred_cls, pmask = postprocess_scene(out, 0, 4)
    # per-point winning instance (score-ordered painting)
    inst = np.full(1024, -1, np.int32)
    for rank, p in enumerate(np.argsort(-scores)):
        if pmask[p]:
            sel = masks[p] & (inst < 0)
            inst[sel] = rank
    return {
        "instance": inst,
        "pred_cls": pred_cls.astype(np.int32),
        "pmask": pmask.astype(np.int32),
        "scores": scores.astype(np.float32),
    }


def test_golden_config1_bit_for_class():
    assert os.path.exists(GOLDEN), (
        "golden file missing — run `python tests/e2e/test_golden.py` to create"
    )
    got = _compute()
    want = np.load(GOLDEN)
    np.testing.assert_array_equal(got["instance"], want["instance"])
    np.testing.assert_array_equal(got["pred_cls"], want["pred_cls"])
    np.testing.assert_array_equal(got["pmask"], want["pmask"])
    np.testing.assert_allclose(got["scores"], want["scores"], rtol=1e-4, atol=1e-5)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    np.savez(GOLDEN, **_compute())
    print(f"wrote {GOLDEN}")
