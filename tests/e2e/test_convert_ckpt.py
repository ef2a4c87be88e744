"""Checkpoint form conversion (scripts/convert_checkpoint.py).

A per-mode run (train form dense-2) is converted to the dense-1 form and
restored under a config WITHOUT the per-mode knob; eval outputs must match
the per-mode eval (which converts on the fly) exactly — proving the
serving path: train with the fast-backward form, deploy a checkpoint in
the fast-forward form with no runtime converter."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

TINY = [
    "--set", "data.num_points=512",
    "--set", "data.voxel_capacity=256",
    "--set", "data.batch_size=2",
    "--set", "data.voxel_size=[0.2,0.2,0.2]",
    "--set", "data.val_scenes=2",
    "--set", "model.backbone.widths=[8,12,16]",
    "--set", "model.backbone.dense_from_scale=1",
    "--set", "model.backbone.grid_extent=[16,16,16]",
    "--set", "model.rpn.hidden=8",
    "--set", "model.rpn.num_proposals=4",
    "--set", "model.rpn.pre_nms_topk=16",
    "--set", "model.rpn.rpn_scales=[0,1]",
    "--set", "model.roi.grid_size=3",
    "--set", "model.roi.hidden=8",
    "--set", "model.roi.mask_grid=6",
    "--set", "model.num_classes=3",
    "--set", "model.max_instances=6",
    "--set", "train.total_steps=2",
    "--set", "train.log_every=1",
    "--set", "train.eval_every=1000",
    "--set", "train.checkpoint_every=2",
    "--set", "train.ema=0.9",
    "--set", "parallel.num_devices=2",
]


def test_convert_checkpoint_roundtrip(tmp_path, monkeypatch):
    import train as train_cli
    from scripts import convert_checkpoint as CC

    import jax
    import jax.numpy as jnp

    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data import synthetic
    from sparse_rcnn_tpu.train import checkpoint as CK
    from sparse_rcnn_tpu.train import loop as TL
    from train import parse_overrides

    src_dir = f"{tmp_path}/ckpt_permode"
    monkeypatch.setattr(sys, "argv", [
        "train.py", *TINY,
        "--set", "model.backbone.dense_from_scale_train=2",
        "--set", f"train.checkpoint_dir={src_dir}",
    ])
    train_cli.main()

    out_dir = f"{tmp_path}/ckpt_dense1"
    monkeypatch.setattr(sys, "argv", [
        "convert_checkpoint.py", "--config", "/dev/null", "--to-dense", "1",
        "--out-dir", out_dir,
        *["--set" if a == "--set" else a for a in TINY],
        "--set", "model.backbone.dense_from_scale_train=2",
        "--set", f"train.checkpoint_dir={src_dir}",
    ])
    # --config is required; use overrides-only via an empty YAML
    open(f"{tmp_path}/empty.yaml", "w").close()
    sys.argv[sys.argv.index("/dev/null")] = f"{tmp_path}/empty.yaml"
    CC.main()

    def ov(extra):
        pairs = [a for a in TINY if a != "--set"]
        return parse_overrides(pairs + extra)

    batch_np = synthetic.generate_batch(7, 2, num_points=512,
                                        num_instances=4, num_classes=3,
                                        extent=2.0)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    # per-mode eval (converts train-form params on the fly)
    cfg_a = load_config(overrides=ov([
        "model.backbone.dense_from_scale_train=2",
        f"train.checkpoint_dir={src_dir}"]))
    state_a = TL.init_state(cfg_a, batch)
    state_a = CK.restore(
        CK.make_manager(src_dir, cfg_a.train.keep_checkpoints), state_a)
    assert state_a is not None
    out_a = TL.make_eval_step(cfg_a)(state_a, batch)

    # converted checkpoint under a config WITHOUT the per-mode knob
    cfg_b = load_config(overrides=ov([f"train.checkpoint_dir={out_dir}"]))
    state_b = TL.init_state(cfg_b, batch)
    state_b = CK.restore(CK.make_manager(out_dir, 1), state_b)
    assert state_b is not None
    assert "enc1_block0" in state_b.params["backbone"]["dense_tail"]
    out_b = TL.make_eval_step(cfg_b)(state_b, batch)

    for key in ("proposal_scores", "cls_logits"):
        np.testing.assert_allclose(
            np.asarray(out_a[key]), np.asarray(out_b[key]),
            rtol=1e-5, atol=1e-5, err_msg=key)

    # converted optimizer moments keep training functional (finite loss)
    state_b2, m = TL.make_train_step(cfg_b)(state_b, batch)
    assert np.isfinite(float(m["total"]))
