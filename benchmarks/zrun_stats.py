#!/usr/bin/env python
"""z-run-length distribution of voxelized scenes (VERDICT r3 item 6).

The z-run/column-layout gather formulation stores each (x, y) column's
z-consecutive sites contiguously so ONE gather descriptor can move a whole
run. Its win over the pencil executor is bounded by the mean run length —
a property of the DATA, not the hardware — so this host-side analysis is
the microbench tier that decides whether the layout is worth building.

Usage: python benchmarks/zrun_stats.py [--voxel 0.02] [--points 262144]
Prints one JSON line per scale.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_stats(coords: np.ndarray) -> dict:
    """coords: int [M, 3] unique voxel coords. Returns z-run statistics."""
    key = (coords[:, 0].astype(np.int64) * 100000
           + coords[:, 1]) * 100000 + coords[:, 2]
    uk = np.unique(key)
    z = uk % 100000
    col = uk // 100000
    brk = np.ones(len(uk), bool)
    brk[1:] = (col[1:] != col[:-1]) | (z[1:] != z[:-1] + 1)
    lens = np.bincount(np.cumsum(brk) - 1)
    return {
        "voxels": int(len(uk)),
        "runs": int(len(lens)),
        "mean_run": round(float(lens.mean()), 3),
        "median_run": float(np.median(lens)),
        "p90_run": float(np.percentile(lens, 90)),
        "frac_singleton_runs": round(float(np.mean(lens == 1)), 3),
        "frac_rows_in_runs_ge4": round(
            float(lens[lens >= 4].sum() / max(len(uk), 1)), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxel", type=float, default=0.02)
    ap.add_argument("--points", type=int, default=262144)
    ap.add_argument("--extent", type=float, default=8.0)
    ap.add_argument("--scales", type=int, default=2)
    ap.add_argument("--seeds", type=int, default=4)
    args = ap.parse_args()

    from sparse_rcnn_tpu.data import synthetic

    for scale in range(args.scales):
        agg = None
        for seed in range(args.seeds):
            scene = synthetic.generate_scene(
                100 + seed, num_points=args.points, num_instances=12,
                num_classes=18, difficulty="hard", extent=args.extent)
            pts = scene["points"][scene["valid"]]
            coords = np.floor(pts / args.voxel).astype(np.int64)
            coords -= coords.min(0)
            coords = np.unique(coords >> scale, axis=0)
            s = run_stats(coords)
            agg = s if agg is None else {
                k: agg[k] + s[k] for k in s
            }
        out = {k: round(v / args.seeds, 3) for k, v in agg.items()}
        out["scale"] = scale
        print(json.dumps(out))


if __name__ == "__main__":
    main()
