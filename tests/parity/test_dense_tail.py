"""Dense-tail backbone == sparse submanifold backbone, exactly.

The dense tail (models/unet.py) claims mathematical equivalence with the
gather-GEMM sparse path: empty cells carry zero features, so a masked dense
conv computes exactly the submanifold sum. This test converts a trained-
shape sparse parameter tree into the dense tail's parameters (kernel
reshape + the conv/convtranspose orientation flips derived in
models/unet.py) and asserts the two full backbones agree on every scale.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_rcnn_tpu.config import load_config
from sparse_rcnn_tpu.data import synthetic
from sparse_rcnn_tpu.models.unet import SparseUNet
from sparse_rcnn_tpu.ops import hierarchy as H
from sparse_rcnn_tpu.ops import voxelize as V

WIDTHS = (6, 10, 14)
EXTENT = (64, 64, 64)


def _inputs(batch_size=2):
    b = synthetic.generate_batch(3, batch_size, num_points=4096,
                                 num_instances=4, num_classes=5, extent=3.0)
    pts, feats = jnp.asarray(b["points"]), jnp.asarray(b["feats"])
    valid = jnp.asarray(b["valid"])
    st, _, ovf = V.voxelize_batch(pts, feats, valid, jnp.asarray([0.05] * 3),
                                  4096)
    assert int(np.asarray(ovf).sum()) == 0
    st, _ = V.rebase_coords(st)
    # every site must fit the dense grid extent, or dense drops it and the
    # equivalence claim doesn't apply
    mask = np.asarray(st.row_mask)
    cs = np.asarray(st.coords)
    assert ((cs[mask] >= 0) & (cs[mask] < np.array(EXTENT))).all()
    caps = (4096, 2048, 1024)
    scales_full, hovf = H.build_hierarchy(st, 3, caps, 3)
    assert int(np.asarray(hovf).sum()) == 0
    return st, scales_full


# the converter is library code (models/convert.py — it powers the
# per-mode dense_from_scale_train knob); this file is its parity oracle
from sparse_rcnn_tpu.models.convert import convert_backbone  # noqa: E402


def _convert(sparse_params, s0, ns, blocks):
    return convert_backbone(dict(sparse_params), s0)


def test_dense_tail_equivalence():
    st, scales = _inputs()
    s0, ns, blocks = 1, len(WIDTHS), 1
    rng = jax.random.PRNGKey(0)

    sparse_net = SparseUNet(widths=WIDTHS, blocks_per_scale=blocks)
    vs = sparse_net.init(rng, st.feats, scales, False)
    # randomize BN stats so eval mode actually exercises them
    stats = jax.tree_util.tree_map(
        lambda x: x + 0.1 * jax.random.normal(rng, x.shape) ** 2,
        vs["batch_stats"],
    )
    sparse_out = sparse_net.apply(
        {"params": vs["params"], "batch_stats": stats},
        st.feats, scales, False)

    dense_net = SparseUNet(widths=WIDTHS, blocks_per_scale=blocks,
                           dense_from_scale=s0, grid_extent=EXTENT)
    sp = vs["params"]["stem"]  # keep naming sanity-checked
    assert "conv" in sp
    dparams = _convert(dict(vs["params"]), s0, ns, blocks)
    dstats = _convert(dict(stats), s0, ns, blocks)
    dense_out = dense_net.apply(
        {"params": dparams, "batch_stats": dstats},
        st.feats, scales, False)

    for s in range(ns):
        a, b = np.asarray(sparse_out[s]), np.asarray(dense_out[s])
        np.testing.assert_allclose(
            a, b, rtol=2e-3, atol=2e-3,
            err_msg=f"scale {s} dense != sparse")


def test_profile_cut_prefixes_match_full_forward():
    """benchmarks/profile_stages ``fwdsplit`` relies on profile_cut returning
    the SAME intermediate values the full forward produces (the cut only
    truncates the program). The dense-tail outputs are finalized before the
    sparse decoder runs, so the dense_tail cut must equal that suffix of the
    full output exactly; the encoder cut must be a single finite array."""
    st, scales = _inputs()
    s0 = 1
    net = SparseUNet(widths=WIDTHS, blocks_per_scale=1,
                     dense_from_scale=s0, grid_extent=EXTENT)
    vs = net.init(jax.random.PRNGKey(1), st.feats, scales, False)
    full = net.apply(vs, st.feats, scales, False)
    tail = net.apply(vs, st.feats, scales, False, profile_cut="dense_tail")
    assert len(tail) == len(WIDTHS) - s0
    for i, t in enumerate(tail):
        np.testing.assert_array_equal(
            np.asarray(full[s0 + i]), np.asarray(t),
            err_msg=f"dense_tail cut diverges at scale {s0 + i}")
    (enc,) = net.apply(vs, st.feats, scales, False, profile_cut="encoder")
    assert np.isfinite(np.asarray(enc)).all()


def test_dense_tail_train_step_matches_structure():
    """Dense-mode training end to end: finite loss + grads flow to the
    dense tail's params."""
    from sparse_rcnn_tpu.train import loop as TL

    cfg = load_config(overrides={
        "data": {"num_points": 4096, "voxel_capacity": 4096, "batch_size": 2,
                  "voxel_size": [0.05] * 3},
        "model": {"backbone": {"widths": list(WIDTHS), "blocks_per_scale": 1,
                                "dense_from_scale": 1,
                                "grid_extent": [64, 64, 64]},
                   "rpn": {"hidden": 8, "num_proposals": 8,
                            "pre_nms_topk": 32, "rpn_scales": [0, 1]},
                   "roi": {"grid_size": 4, "hidden": 8, "mask_grid": 8},
                   "num_classes": 5, "max_instances": 8},
        "train": {"warmup_steps": 1, "total_steps": 10},
    })
    b = synthetic.generate_batch(0, 2, num_points=4096, num_instances=4,
                                 num_classes=5, extent=3.0)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    state = TL.init_state(cfg, batch)
    assert "dense_tail" in state.params["backbone"]
    # snapshot before the step — make_train_step donates the state
    w0 = np.asarray(
        state.params["backbone"]["dense_tail"]["enc1_block0"]["conv1"]["kernel"]
    )
    step = TL.make_train_step(cfg)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total"]))
    # second step: past LR warmup (step 0 has lr == 0), kernels must move
    state3, metrics = step(state2, batch)
    assert np.isfinite(float(metrics["total"]))
    w1 = state3.params["backbone"]["dense_tail"]["enc1_block0"]["conv1"]["kernel"]
    assert not np.allclose(w0, np.asarray(w1))
