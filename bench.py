"""Benchmark harness — prints ONE JSON line for the driver.

PRIMARY metric (BASELINE.json): ScanNet-shaped scenes/sec/chip at 2cm
voxels — config-2 workload (262,144-voxel capacity, 5-scale bf16 backbone
with the dense tail from scale 2, multi-scale RPN, P=128 proposals),
measured for BOTH the fully-jitted eval step and the train step, plus an
MFU figure from the compiled HLO cost analysis. The 5cm config-1 number is
kept for round-over-round comparability.

Denominators (reference mount is empty — SURVEY.md §0 — so both are the
labeled pure-PyTorch-CPU twin):
  * 5cm tiny: re-measured live each run (fast).
  * 2cm config-2 shape: measured 2026-08-17 on this host (DeepUNetTorch,
    208k voxels/scene, 100.7 s/scene) and cached below — a live run would
    add ~2 minutes of CPU time per bench invocation.

Timing methodology: the execution relay deduplicates identical in-flight
(executable, input) calls and the first timed executable in a process
carries a ~35ms artifact, so every timed call gets DISTINCT inputs and a
warmup call precedes timing (see BASELINE.md perf notes).
"""

import json
import os
import sys
import time

# measured once (see module docstring); scenes/sec of the CPU twin on the
# exact 2cm workload shape
CPU_TWIN_2CM_SPS = 0.00993
V5E_BF16_PEAK_FLOPS = 197e12


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


def _timed_sps(fn, batches, batch_size):
    """scenes/sec over distinct pre-staged batches (relay dedup-safe)."""
    import jax

    out = fn(batches[-1])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(b) for b in batches]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    return len(batches) * batch_size / dt


def bench_config2():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data import synthetic
    from sparse_rcnn_tpu.train import loop as TL
    from sparse_rcnn_tpu.utils.profiling import cost_table

    cfg = load_config(overrides={
        "data": {"num_points": 262144, "voxel_capacity": 262144,
                  "batch_size": 1, "voxel_size": [0.02] * 3},
        "model": {
            "backbone": {"widths": [32, 64, 96, 128, 160],
                          "blocks_per_scale": 2, "dtype": "bfloat16",
                          "dense_from_scale": 2,
                          "grid_extent": [512, 512, 256]},
            "rpn": {"hidden": 128, "num_proposals": 128,
                     "pre_nms_topk": 512, "rpn_scales": [0, 1]},
            "roi": {"grid_size": 7, "hidden": 128, "mask_grid": 14},
            "num_classes": 18, "max_instances": 64,
        },
    })
    scenes = [synthetic.generate_scene(
        100 + i, num_points=262144, num_instances=12, num_classes=18,
        extent=8.0) for i in range(4)]
    batches = [
        {k: jnp.asarray(v)[None] for k, v in s.items()} for s in scenes
    ]
    state = TL.init_state(cfg, batches[0])
    estep = TL.make_eval_step(cfg)
    eval_sps = _timed_sps(lambda b: estep(state, b), batches, 1)

    flops = None
    try:
        analysis = cost_table(estep, state, batches[0])
        flops = float(analysis.get("flops", 0.0))
    except Exception:
        pass
    mfu = (flops * eval_sps / V5E_BF16_PEAK_FLOPS) if flops else None

    # train step DONATES its input state — carry the returned one
    tstep = TL.make_train_step(cfg)
    s, m = tstep(state, batches[-1])
    jax.block_until_ready(m["total"])
    t0 = time.perf_counter()
    for b in batches:
        s, m = tstep(s, b)
    jax.block_until_ready(m["total"])
    train_sps = len(batches) / (time.perf_counter() - t0)
    mean_vox = float(np.mean([208073]))  # logged voxels/scene at this shape
    return {
        "eval_sps": round(eval_sps, 3),
        "train_sps": round(train_sps, 3),
        "mfu_eval": round(mfu, 5) if mfu is not None else None,
        "hlo_gflops_per_scene": round(flops / 1e9, 1) if flops else None,
        "mean_voxels": mean_vox,
    }


def bench_config1():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data import synthetic
    from sparse_rcnn_tpu.train import loop as TL

    num_points, voxel_size, batch_size = 32768, 0.05, 4
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
    scenes = [synthetic.generate_scene(100 + i, num_points=num_points,
                                       num_instances=8, num_classes=6)
              for i in range(batch_size)]
    batch = {k: jnp.asarray(np.stack([s[k] for s in scenes]))
             for k in scenes[0]}
    state = TL.init_state(cfg, batch)
    step = TL.make_eval_step(cfg)
    iters = 10
    batches = [dict(batch, feats=batch["feats"] + (i + 1) * 1e-4)
               for i in range(iters)]
    sps = _timed_sps(lambda b: step(state, b), batches, batch_size)

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    from torch_cpu_ref import measure_scenes_per_sec

    cpu_sps, cpu_info = measure_scenes_per_sec(
        scenes, voxel_size=voxel_size, widths=(16, 32), num_classes=6,
    )
    return {"sps": round(sps, 3), "cpu_sps": round(cpu_sps, 3),
            "mean_voxels": round(cpu_info["mean_voxels"])}


def main():
    import jax

    enable_compile_cache()
    c2 = bench_config2()
    c1 = bench_config1()
    print(json.dumps({
        "metric": "config2_scenes_per_sec_2cm_eval",
        "value": c2["eval_sps"],
        "unit": "scenes/sec/chip",
        "vs_baseline": round(c2["eval_sps"] / CPU_TWIN_2CM_SPS, 1),
        "baseline": {
            "kind": "torch_cpu_twin config2-shape @2cm "
                    "(reference mount empty; substitute, cached measurement)",
            "scenes_per_sec": CPU_TWIN_2CM_SPS,
        },
        "config2_train_sps": c2["train_sps"],
        "config2_mfu_eval": c2["mfu_eval"],
        "config2_hlo_gflops_per_scene": c2["hlo_gflops_per_scene"],
        "config1_5cm_sps": c1["sps"],
        "config1_vs_cpu_twin_live": round(c1["sps"] / c1["cpu_sps"], 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
