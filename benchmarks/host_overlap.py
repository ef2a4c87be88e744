#!/usr/bin/env python
"""Host-voxelization overlap measurement (BASELINE config 5; VERDICT r2
item 7): at config-5 shapes (262k points, batch 8, worker threads + C++
host voxelizer), is the input feed hidden behind device compute?

Runs the config-5 workload on however many devices are visible (the single
tunneled v5e chip in this environment — the per-chip compute time there is
an upper bound on what each chip of a v5e-8 would give the loader), drives
N train steps from the production Loader, and reports the loader-starvation
fraction: consumer wall time spent blocked on the batch queue / total.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/host_overlap.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")
from sparse_rcnn_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402

print = functools.partial(print, flush=True)

STEPS = 6


def main():
    from sparse_rcnn_tpu import native
    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data.pipeline import Loader
    from sparse_rcnn_tpu.train import loop as TL

    # config 5 runs 1 scene per chip on a v5e-8 (batch 8 over 8 devices);
    # the single visible chip therefore measures the per-chip workload at
    # batch = #devices — batch 8 on ONE chip would be 8x the per-chip
    # memory/compute and is not what any chip of the pod sees.
    n_dev = len(jax.devices())
    cfg = load_config("configs/config5_v5e8_dp.yaml", overrides={
        "data": {"dataset": "synthetic", "host_voxelize": True,
                 "batch_size": n_dev},
        "parallel": {"num_devices": 0},
    })
    print(f"# device(s): {jax.devices()}, host_voxelize native available: "
          f"{native.available()}")
    loader = Loader(cfg, "train", train=True, seed=0)
    it = iter(loader)
    t_first0 = time.perf_counter()
    batch = next(it)
    first_batch_s = time.perf_counter() - t_first0

    state = TL.init_state(cfg, batch)
    step = TL.make_train_step(cfg)
    state, m = step(state, batch)          # compile + warm
    jax.block_until_ready(m["total"])

    # steady state: reset counters AFTER warmup so compile time and the
    # pipeline fill don't count as starvation
    loader.wait_s = 0.0
    loader.batches_out = 0
    t0 = time.perf_counter()
    for _ in range(STEPS):
        batch = next(it)
        state, m = step(state, batch)
    jax.block_until_ready(m["total"])
    total_s = time.perf_counter() - t0
    loader.close()

    starvation = loader.wait_s / total_s
    print(json.dumps({
        "config": "config5 shape (synthetic, single-chip device loop)",
        "steps": STEPS,
        "batch_size": cfg.data.batch_size,
        "scenes_per_sec": round(STEPS * cfg.data.batch_size / total_s, 3),
        "first_batch_s": round(first_batch_s, 3),
        "loader_wait_s": round(loader.wait_s, 4),
        "total_s": round(total_s, 3),
        "starvation_fraction": round(starvation, 5),
        "host_voxelize": bool(native.available()),
        "voxel_overflow": int(m["voxel_overflow"]),
    }))


if __name__ == "__main__":
    main()
