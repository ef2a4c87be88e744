"""Stage-split profiler on the real chip: voxelize / hierarchy / fwd / train.

Times each pipeline stage of the config-2-shaped workload (2cm density,
BASELINE primary metric) — or any capacity via flags — so executor and
rulebook changes can be judged by measured stage shares, not guesses
(VERDICT r1 items 2/3/5).

Usage:
  python benchmarks/profile_stages.py [--cap 262144] [--batch 1] \
      [--widths 32,64,96,128,160] [--blocks 2] [--dtype bfloat16] \
      [--executor auto] [--iters 5] [--train] [--tiny]

Prints one JSON line per stage: {"stage": ..., "ms_per_scene": ...}.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=262144)
    ap.add_argument("--points", type=int, default=262144)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--widths", default="32,64,96,128,160")
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--executor", default="auto")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--voxel", default="0.02",
                    help="voxel size: one float or x,y,z (anisotropic, "
                         "config 4)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize residual blocks (config 3)")
    ap.add_argument("--scene-extent", type=float, default=8.0,
                    help="synthetic scene extent in meters")
    ap.add_argument("--classes", type=int, default=18)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--proposals", type=int, default=128)
    ap.add_argument("--stages", default="voxelize,hierarchy,eval")
    ap.add_argument("--dense", type=int, default=0,
                    help="dense_from_scale (0 = fully sparse)")
    ap.add_argument("--dense-train", type=int, default=0,
                    help="per-mode dense_from_scale_train (0 = same as "
                         "--dense); the train stage then runs this form "
                         "while eval converts (models/convert.py)")
    ap.add_argument("--shared-pencil-bwd", type=int, default=None,
                    help="0/1: override the auto-mode gate for the pencil "
                         "branch of the shared backward (A/B)")
    ap.add_argument("--subm-second-half", default=None,
                    choices=["antisym", "direct"],
                    help="submanifold rulebook second-half construction "
                         "(scatter-transpose vs direct bulk lookup) A/B")
    ap.add_argument("--extent", default="512,512,256")
    ap.add_argument("--capacities", default=None,
                    help="comma-separated explicit per-scale row capacities "
                         "(overrides the capacity_factor decay) — A/B knob "
                         "for sizing caps to measured per-scale occupancy; "
                         "gather/sort cost scales with CAP, not nvalid")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import bench

    bench.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data import synthetic
    from sparse_rcnn_tpu.ops import hierarchy as H
    from sparse_rcnn_tpu.ops import sparse_conv as SC
    from sparse_rcnn_tpu.ops import voxelize as V
    from sparse_rcnn_tpu.train import loop as TL

    SC.set_executor_mode(args.executor)
    if args.shared_pencil_bwd is not None:
        SC.set_shared_pencil_bwd(bool(args.shared_pencil_bwd))
    if args.subm_second_half is not None:
        from sparse_rcnn_tpu.ops import rulebook as RB

        RB.set_subm_second_half(args.subm_second_half)
    widths = tuple(int(w) for w in args.widths.split(","))
    bb = {"widths": list(widths), "blocks_per_scale": args.blocks,
          "dtype": args.dtype, "remat": args.remat}
    if args.dense:
        bb["dense_from_scale"] = args.dense
        bb["grid_extent"] = [int(e) for e in args.extent.split(",")]
        if args.dense_train:
            bb["dense_from_scale_train"] = args.dense_train
    elif args.dense_train:
        # fail fast: without --dense the knob would be dropped on the floor
        # and the printed numbers attributed to a form that never ran
        ap.error("--dense-train requires --dense (config validation would "
                 "reject a train-only dense tail)")
    if args.capacities:
        caps = [int(c) for c in args.capacities.split(",")]
        if len(caps) != len(widths):
            ap.error(f"--capacities needs {len(widths)} values, got {caps}")
        bb["capacities"] = caps
    vox_sizes = [float(v) for v in args.voxel.split(",")]
    if len(vox_sizes) == 1:
        vox_sizes = vox_sizes * 3
    if len(vox_sizes) != 3:
        ap.error(f"--voxel takes one float or x,y,z, got {args.voxel!r}")
    cfg = load_config(overrides={
        "data": {"num_points": args.points, "voxel_capacity": args.cap,
                  "batch_size": args.batch,
                  "voxel_size": vox_sizes},
        "model": {
            "backbone": bb,
            "rpn": {"hidden": 128, "num_proposals": args.proposals,
                     "pre_nms_topk": 4 * args.proposals, "rpn_scales": [0, 1]},
            "roi": {"grid_size": 7, "hidden": 128, "mask_grid": 14},
            "num_classes": args.classes, "max_instances": 64,
        },
    })
    dev = jax.devices()[0]
    print(f"# device={dev} cap={args.cap} widths={widths} "
          f"dtype={args.dtype} executor={args.executor}", file=sys.stderr)

    scenes = [
        synthetic.generate_scene(7 + i, num_points=args.points,
                                 num_instances=12, num_classes=args.classes,
                                 extent=args.scene_extent)
        for i in range(args.batch)
    ]
    batch = {k: jnp.asarray(np.stack([s[k] for s in scenes]))
             for k in scenes[0]}
    vs = jnp.asarray(cfg.data.voxel_size)

    def timed(name, fn, *xs, vary=None):
        out = fn(*xs)
        jax.block_until_ready(out)
        variants = []
        for i in range(args.iters):
            ys = list(xs)
            if vary is not None:
                ys[vary] = jax.tree_util.tree_map(
                    lambda a: a + jnp.zeros_like(a) + (i + 1) * 1e-6
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, ys[vary])
            variants.append(tuple(jax.block_until_ready(ys)))
        t0 = time.perf_counter()
        outs = [fn(*v) for v in variants]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.iters
        ms = dt * 1000.0 / args.batch
        print(json.dumps({"stage": name, "ms_per_scene": round(ms, 2)}),
              flush=True)
        return out

    want = set(args.stages.split(","))

    vox = jax.jit(lambda p, f, v: V.voxelize_batch(p, f, v, vs, args.cap))
    st, p2v, ovf = vox(batch["points"], batch["feats"], batch["valid"])
    st, _ = V.rebase_coords(st)
    if "voxelize" in want:
        timed("voxelize", vox, batch["points"], batch["feats"], batch["valid"],
              vary=0)
    print(f"# voxels/scene: {np.asarray(st.nvalid)}", file=sys.stderr)

    caps = cfg.scale_capacities()
    hier = jax.jit(lambda s: H.build_hierarchy(
        s, len(widths), caps, cfg.model.backbone.kernel_size,
        subm_scales=cfg.model.backbone.dense_from_scale))
    if "hierarchy" in want:
        timed("hierarchy", hier, st, vary=0)

    if "fwd" in want:
        model = TL.build_model(cfg)
        scales, _ = hier(st)
        variables = model.init(jax.random.PRNGKey(0), st.feats, scales,
                               train=False)

        @jax.jit
        def fwd(feats, scales):
            return model.apply(variables, feats, scales, train=False)

        timed("model_fwd", fwd, st.feats, scales, vary=0)

    if "fwdsplit" in want:
        # Attribute the backbone forward by jit-timing nested prefixes of
        # the SAME network (profile_cut; XLA DCEs everything past the cut):
        # encoder = t(enc); dense tail = t(tail) - t(enc);
        # sparse decoder = t(backbone) - t(tail); heads = t(model) - t(bb).
        from sparse_rcnn_tpu.models.unet import SparseUNet

        bbcfg = cfg.model.backbone
        bbm = SparseUNet(
            widths=bbcfg.widths, blocks_per_scale=bbcfg.blocks_per_scale,
            kernel_size=bbcfg.kernel_size,
            dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
            remat=bbcfg.remat, dense_from_scale=bbcfg.dense_from_scale,
            grid_extent=bbcfg.grid_extent, downsample=bbcfg.downsample,
            dropout=bbcfg.dropout)
        scales, _ = hier(st)
        bvars = bbm.init(jax.random.PRNGKey(0), st.feats, scales,
                         train=False)
        cuts = ["encoder"]
        if bbcfg.dense_from_scale:
            cuts.append("dense_tail")
        cuts.append(None)
        for cut in cuts:
            fn = jax.jit(lambda f, sc, _c=cut: bbm.apply(
                bvars, f, sc, train=False, profile_cut=_c))
            timed(f"bb_to_{cut or 'full'}", fn, st.feats, scales, vary=0)

    if "loss" in want or "grad" in want:
        # Decompose the train step (VERDICT r2 item 2: "where does train
        # time go"): fwd_loss = prepare_inputs + forward + losses (no
        # grad); grad = value_and_grad of the same. So
        # backward = grad - fwd_loss and optimizer/EMA = train_step - grad.
        # init_state returns TRAIN-form params (train_cfg applies the
        # per-mode dense_from_scale_train boundary), so the loss/grad
        # attribution must build/apply the TRAIN-form model too
        tcfg = TL.train_cfg(cfg)
        model = TL.build_model(tcfg)
        gstate = TL.init_state(cfg, batch)

        def loss_of(params, b):
            st2, _, scales2, gt2, _aux = TL.prepare_inputs(tcfg, b)
            out, updates = model.apply(
                {"params": params, "batch_stats": gstate.batch_stats},
                st2.feats, scales2, train=True,
                gt_boxes=gt2.boxes, gt_boxes_valid=gt2.valid,
                mutable=["batch_stats"],
            )
            total, _parts = TL.compute_losses(
                tcfg, out, scales2, gt2, st2.row_mask)
            return total

        if "loss" in want:
            lfn = jax.jit(loss_of)
            timed("fwd_loss", lambda b: lfn(gstate.params, b), batch, vary=0)
        if "grad" in want:
            gfn = jax.jit(jax.grad(loss_of))
            timed("grad", lambda b: gfn(gstate.params, b), batch, vary=0)

    if "eval" in want or "train" in want or args.train:
        state = TL.init_state(cfg, batch)
        if "eval" in want:
            estep = TL.make_eval_step(cfg)
            timed("eval_step", lambda b: estep(state, b), batch, vary=0)
        if "train" in want or args.train:
            # make_train_step donates the state (argnum 0), so the timed
            # loop must CHAIN states — re-calling with an already-donated
            # state surfaces through the axon relay as an opaque
            # "TPU backend error (InvalidArgument)" at execution time.
            tstep = TL.make_train_step(cfg)
            tstate = TL.init_state(cfg, batch)  # fresh: `state` feeds eval
            tstate, _ = tstep(tstate, batch)    # compile + warm
            jax.block_until_ready(tstate)
            variants = []
            for i in range(args.iters):
                b = jax.tree_util.tree_map(
                    lambda a: a + jnp.zeros_like(a) + (i + 1) * 1e-6
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, batch)
                variants.append(jax.block_until_ready(b))
            t0 = time.perf_counter()
            for b in variants:
                tstate, m = tstep(tstate, b)
            jax.block_until_ready(m["total"])
            dt = (time.perf_counter() - t0) / args.iters
            print(json.dumps({"stage": "train_step",
                              "ms_per_scene":
                              round(dt * 1000.0 / args.batch, 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
