#!/usr/bin/env python
"""E2E overflow-counter probe on the real chip (VERDICT r2 item 4 /
SURVEY.md §7 invariant 1: overflow = deterministic drop + counters,
never a crash).

Drives ONE full train step at an S3DIS-sized scene (524k points) through a
deliberately too-small pipeline — voxel capacity below the live voxel
count, a dense-tail grid extent smaller than the scene, and an instance
budget below the scene's instance count — and prints every overflow
counter from the step metrics. Pass/fail is printed per counter: the point
is a RECORDED demonstration that capacity pressure degrades into counted
drops with finite losses, not NaNs or crashes.

Usage: python benchmarks/overflow_probe.py [--cap 131072] [--points 524288]
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=524288)
    ap.add_argument("--cap", type=int, default=131072,
                    help="voxel capacity, deliberately < live voxels")
    ap.add_argument("--extent", default="256,256,128",
                    help="dense-tail grid extent, deliberately small")
    ap.add_argument("--scene-extent", type=float, default=12.0)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import bench

    bench.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data import synthetic
    from sparse_rcnn_tpu.train import loop as TL

    cfg = load_config(overrides={
        "data": {"num_points": args.points, "voxel_capacity": args.cap,
                  "batch_size": 1, "voxel_size": [0.02, 0.02, 0.02]},
        "model": {
            "backbone": {"widths": [32, 64, 96, 128], "blocks_per_scale": 1,
                          "dtype": "bfloat16", "dense_from_scale": 2,
                          "grid_extent": [int(e) for e in
                                          args.extent.split(",")]},
            "rpn": {"hidden": 64, "num_proposals": 64, "pre_nms_topk": 256,
                     "rpn_scales": [0, 1]},
            "roi": {"grid_size": 7, "hidden": 64, "mask_grid": 14},
            "num_classes": 13,
            # deliberately below the scene's instance count
            "max_instances": 4,
        },
    })
    # dense scene: many instances, big extent, more points than cap
    scene = synthetic.generate_scene(3, num_points=args.points,
                                     num_instances=24, num_classes=13,
                                     extent=args.scene_extent,
                                     difficulty="hard")
    batch = {k: jnp.asarray(np.asarray(v)[None]) for k, v in scene.items()}
    print(f"# device={jax.devices()[0]} points={args.points} "
          f"cap={args.cap} grid={args.extent}", file=sys.stderr)

    state = TL.init_state(cfg, batch)
    step = TL.make_train_step(cfg)
    state, m = step(state, batch)
    jax.block_until_ready(m["total"])

    counters = {k: int(jax.device_get(m[k])) for k in
                ("voxel_overflow", "hierarchy_overflow",
                 "gt_instance_overflow", "dense_tail_oob") if k in m}
    total = float(jax.device_get(m["total"]))
    out = {
        "counters": counters,
        "loss_total": round(total, 4),
        "loss_finite": bool(np.isfinite(total)),
        "voxels_per_scene": int(jax.device_get(m["voxels_per_scene"])),
        "nonzero_counters": [k for k, v in counters.items() if v > 0],
    }
    print(json.dumps(out))
    ok = out["loss_finite"] and len(out["nonzero_counters"]) >= 2
    print(f"# {'PASS' if ok else 'FAIL'}: overflow degraded into counted "
          f"drops with a finite loss", file=sys.stderr)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
