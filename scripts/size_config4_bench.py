#!/usr/bin/env python
"""Occupancy sizing for config-4 (SemanticKITTI shape) — VERDICT r4 item 5.

`scripts/size_capacities.py` streams the config's Loader, but config-4's
bench harness builds its LiDAR-sweep stand-ins with
``synthetic.stretch_scene`` (100x100x6 m anisotropic sweeps), which the
Loader never applies — so this probe sizes over the UNION of both serving
distributions (BASELINE.md round-4 sizing rule: size over EVERY
distribution the caps serve):

  * bench distribution: stretched scenes exactly as bench.bench_config4
    generates them (seeds 300+);
  * loader distribution: the synthetic dataset's augmented train scenes at
    the config shape.

Run on CPU (no chip needed): JAX_PLATFORMS=cpu python scripts/size_config4_bench.py
"""

import json
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data import synthetic
    from sparse_rcnn_tpu.data.augment import augment_scene
    from sparse_rcnn_tpu.ops import hierarchy as H
    from sparse_rcnn_tpu.ops import voxelize as V

    margin = 1.3
    cfg = load_config("configs/config4_semantic_kitti.yaml",
                      overrides={"data": {"dataset": "synthetic"}})
    ns = len(cfg.model.backbone.widths)
    caps = cfg.scale_capacities()

    def probe(batch):
        vs = jnp.asarray(cfg.data.voxel_size)
        st, _, vovf = V.voxelize_batch(
            batch["points"], batch["feats"], batch["valid"], vs,
            cfg.data.voxel_capacity)
        st, _ = V.rebase_coords(st, margin=2)
        scales, hovf = H.build_hierarchy(
            st, ns, caps, cfg.model.backbone.kernel_size,
            subm_scales=cfg.model.backbone.dense_from_scale)
        nvalid = jnp.stack([s.nvalid for s in scales], axis=1)
        row_live = (jnp.arange(st.capacity)[None, :, None]
                    < st.nvalid[:, None, None])
        span = jnp.max(jnp.where(row_live, st.coords, 0), axis=1) + 1
        return nvalid, span, jnp.sum(vovf), jnp.sum(hovf)

    probe_j = jax.jit(probe)

    def scenes_bench(n):
        for i in range(n):
            yield synthetic.stretch_scene(
                synthetic.generate_scene(
                    300 + i, num_points=cfg.data.num_points,
                    num_instances=12, num_classes=cfg.model.num_classes,
                    num_features=cfg.data.num_features, extent=8.0),
                [12.5, 12.5, 0.75])

    def scenes_loader(n):
        rng = np.random.default_rng(0)
        for i in range(n):
            s = synthetic.generate_scene(
                i, num_points=cfg.data.num_points, num_instances=12,
                num_classes=cfg.model.num_classes,
                num_features=cfg.data.num_features)
            yield augment_scene(s, cfg.data, rng) if cfg.data.augment else s

    max_sites = np.zeros(ns, np.int64)
    max_span = np.zeros(3, np.int64)
    per_dist = {}
    for name, gen in [("bench", scenes_bench(8)), ("loader", scenes_loader(8))]:
        d_sites = np.zeros(ns, np.int64)
        d_span = np.zeros(3, np.int64)
        for s in gen:
            batch = {k: jnp.asarray(v)[None] for k, v in s.items()}
            nv, span, vovf, hovf = jax.device_get(probe_j(batch))
            d_sites = np.maximum(d_sites, nv[0])
            d_span = np.maximum(d_span, span[0])
            assert int(vovf) == 0 and int(hovf) == 0, (name, vovf, hovf)
        per_dist[name] = {"max_sites": d_sites.tolist(),
                          "max_span": d_span.tolist()}
        max_sites = np.maximum(max_sites, d_sites)
        max_span = np.maximum(max_span, d_span)

    def round_up(v, m):
        return -(-int(v) // m) * m

    suggested = [int(caps[0])] + [
        min(round_up(max(max_sites[s] * margin, 128), 128), int(caps[0]))
        for s in range(1, ns)]
    print(json.dumps({
        "config": "config4_semantic_kitti (union: bench stretched + loader augmented)",
        "caps_now": [int(c) for c in caps],
        "max_sites_union": max_sites.tolist(),
        "max_span_stride1": max_span.tolist(),
        "margin": margin,
        "suggested_capacities": suggested,
        "per_distribution": per_dist,
    }, indent=1))


if __name__ == "__main__":
    main()
