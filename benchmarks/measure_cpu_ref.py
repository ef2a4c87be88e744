#!/usr/bin/env python
"""Measure the CPU reference denominator (BASELINE.md action item).

If the actual reference repo is present at /root/reference (it was EMPTY at
survey time, SURVEY.md §0), this script refuses to substitute silently and
tells you to wire the real entry point. Otherwise it measures the
pure-PyTorch-CPU twin of BASELINE config 1 (`torch_cpu_ref.py`) and prints
one JSON line, clearly labeled as a substitute.

    python benchmarks/measure_cpu_ref.py [--scenes N] [--points N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--voxel-size", type=float, default=0.05)
    args = ap.parse_args()

    ref_files = []
    if os.path.isdir("/root/reference"):
        for _, _, files in os.walk("/root/reference"):
            ref_files.extend(files)
    if ref_files:
        print(json.dumps({
            "error": "reference tree is now populated — run the actual "
                     "reference instead of the twin and update this harness",
            "files_found": len(ref_files),
        }))
        sys.exit(2)

    from sparse_rcnn_tpu.data import synthetic
    from torch_cpu_ref import measure_scenes_per_sec

    scenes = [
        synthetic.generate_scene(100 + i, num_points=args.points,
                                 num_instances=8, num_classes=6)
        for i in range(args.scenes)
    ]
    sps, info = measure_scenes_per_sec(scenes, voxel_size=args.voxel_size)
    print(json.dumps({
        "metric": "cpu_reference_scenes_per_sec",
        "value": round(sps, 4),
        "kind": "torch_cpu_twin (SUBSTITUTE: reference mount empty, SURVEY.md §0)",
        **{k: round(v, 2) if isinstance(v, float) else v for k, v in info.items()},
    }))


if __name__ == "__main__":
    main()
