"""Benchmark harness — prints ONE JSON line for the driver.

Workload: BASELINE config 1 shape (single ScanNet-like synthetic scene,
5 cm voxels, tiny sparse UNet + heads). TPU numerator: the framework's
fully-jitted eval step (voxelize → backbone → RPN → RoI → masks — a
superset of the twin's work). CPU denominator: the pure-PyTorch-CPU
reference twin (`benchmarks/torch_cpu_ref.py`) re-measured each run —
a substitute for the reference repo, whose mount is empty (SURVEY.md §0);
flagged via "baseline" field.
"""

import json
import os
import sys
import time


def enable_compile_cache():
    """Persistent XLA compilation cache — first-run compiles through the
    remote-compile tunnel take many minutes; reruns must not."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax — cache is best-effort


def main():
    import jax

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data import synthetic
    from sparse_rcnn_tpu.train import loop as TL

    num_points = 32768
    voxel_size = 0.05
    batch_size = 4  # amortizes per-dispatch latency; metric stays per-scene
    cfg = load_config(overrides={
        "data": {"num_points": num_points, "voxel_capacity": 32768,
                  "batch_size": batch_size, "voxel_size": [voxel_size] * 3},
        "model": {
            "backbone": {"widths": [16, 32], "blocks_per_scale": 1},
            "rpn": {"hidden": 32, "num_proposals": 32, "pre_nms_topk": 128},
            "roi": {"grid_size": 7, "hidden": 32, "mask_grid": 14},
            "num_classes": 6, "max_instances": 16,
        },
    })

    scenes = [
        synthetic.generate_scene(100 + i, num_points=num_points,
                                 num_instances=8, num_classes=6)
        for i in range(batch_size)
    ]
    batch = {
        k: jnp.asarray(np.stack([s[k] for s in scenes]))
        for k in scenes[0]
    }

    state = TL.init_state(cfg, batch)
    step = TL.make_eval_step(cfg)

    # Each timed call gets DISTINCT inputs: the execution relay deduplicates
    # identical (executable, inputs) calls, which silently turns a timing
    # loop over one batch into a cache benchmark.
    iters = 10
    batches = [
        dict(batch, feats=batch["feats"] + (i + 1) * 1e-4) for i in range(iters)
    ]
    batches = jax.block_until_ready(batches)

    # warmup / compile
    out = step(state, batch)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    outs = [step(state, b) for b in batches]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    tpu_sps = iters * cfg.data.batch_size / dt

    # CPU reference twin (substitute baseline — reference mount empty)
    sys.path.insert(0, "benchmarks")
    from torch_cpu_ref import measure_scenes_per_sec

    cpu_sps, cpu_info = measure_scenes_per_sec(
        scenes, voxel_size=voxel_size, widths=(16, 32), num_classes=6,
    )

    print(json.dumps({
        "metric": "config1_scenes_per_sec_5cm_tiny_unet",
        "value": round(tpu_sps, 3),
        "unit": "scenes/sec/chip",
        "vs_baseline": round(tpu_sps / cpu_sps, 2),
        "baseline": {
            "kind": "torch_cpu_twin (reference mount empty; substitute)",
            "scenes_per_sec": round(cpu_sps, 3),
            "mean_voxels": round(cpu_info["mean_voxels"]),
        },
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
