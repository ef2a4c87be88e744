#!/usr/bin/env python
"""Measure per-scale voxel occupancy and per-axis spans; suggest capacities.

Static shapes mean every sort/gather/scatter in the backbone prices at the
configured CAPACITY, not the live site count — BASELINE.md's round-4
occupancy table measured configs paying up to 4x at coarse scales because
the default ``capacity_factor`` decay (0.75/scale) is far above the real
site decay of surface scans (~2-3.3x per downsample). This tool turns that
insight into a per-dataset mechanism (the capacity analog of
``config.derive_grid_extent``):

    python scripts/size_capacities.py --config configs/config3_s3dis.yaml \
        [--split train] [--scenes 8] [--margin 1.3] [--no-augment]

It streams ``--scenes`` scenes through the config's own Loader (so
augmentation — which grows extents via rotation — and the host-voxelize
path apply exactly as in training), builds the voxel hierarchy per batch,
and reports per scale: max live sites, the configured capacity, occupancy,
and a suggested capacity = ``round_up(max * margin, 128)``. A scale whose
measured max EQUALS its capacity is saturated (rows were dropped) — the
suggestion is then a lower bound and is flagged; raise the cap and re-run.

Also reports the per-axis coordinate span at stride 1 (after the rebase
margin) vs ``model.backbone.grid_extent`` so dense-tail slack (empty-cell
MXU work — the round-4 z-crop lever) is visible in the same pass.

Suggestions are printed as a YAML fragment to paste into the config;
overflow counters remain the runtime guard for scenes beyond the measured
sample (SURVEY.md §7 invariant 1).
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser(
        description="suggest per-scale capacities from measured occupancy")
    ap.add_argument("--config", required=True)
    ap.add_argument("--set", action="append", dest="overrides",
                    metavar="key.path=value")
    ap.add_argument("--split", default="train")
    ap.add_argument("--scenes", type=int, default=8,
                    help="number of scenes to measure (maxima over all)")
    ap.add_argument("--margin", type=float, default=1.3,
                    help="suggested cap = round_up(max_sites * margin, 128)")
    ap.add_argument("--no-augment", action="store_true",
                    help="bypass train-split augmentation (sizes the raw "
                         "data; augmented rotations can grow x/y spans)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, ".")
    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data.pipeline import Loader
    from sparse_rcnn_tpu.ops import hierarchy as H
    from sparse_rcnn_tpu.ops import voxelize as V
    from sparse_rcnn_tpu.sparse import make_sparse_tensor
    from train import parse_overrides

    cfg = load_config(args.config, parse_overrides(args.overrides))
    ns = len(cfg.model.backbone.widths)
    caps = cfg.scale_capacities()

    def probe(batch):
        vs = jnp.asarray(cfg.data.voxel_size)
        if "voxel_coords" in batch:
            st = make_sparse_tensor(batch["voxel_coords"],
                                    batch["voxel_feats"],
                                    batch["voxel_nvalid"], assume_sorted=True)
            vovf = batch["voxel_overflow"]
        else:
            st, _, vovf = V.voxelize_batch(
                batch["points"], batch["feats"], batch["valid"], vs,
                cfg.data.voxel_capacity)
        st, _ = V.rebase_coords(st, margin=2)
        scales, hovf = H.build_hierarchy(
            st, ns, caps, cfg.model.backbone.kernel_size,
            subm_scales=cfg.model.backbone.dense_from_scale)
        nvalid = jnp.stack([s.nvalid for s in scales], axis=1)  # [B, S]
        # padding rows hold the max sentinel — mask by row index instead
        row_live = (jnp.arange(st.capacity)[None, :, None]
                    < st.nvalid[:, None, None])
        span = jnp.max(jnp.where(row_live, st.coords, 0), axis=1) + 1
        # [B, 3] stride-1 cells incl. the rebase margin
        return nvalid, span, jnp.sum(vovf), jnp.sum(hovf)

    probe_j = jax.jit(probe)
    train = args.split == "train" and not args.no_augment
    loader = Loader(cfg, args.split, train=train, seed=args.seed)
    it = iter(loader)
    max_sites = np.zeros(ns, np.int64)
    max_span = np.zeros(3, np.int64)
    vovf_total = hovf_total = 0
    seen = 0
    while seen < args.scenes:
        batch = next(it, None)
        if batch is None:
            # eval-mode loaders make one finite ordered pass; cap at the
            # pool instead of crashing when --scenes exceeds it
            print(f"# pool exhausted after {seen} scenes "
                  f"(asked for {args.scenes})", file=sys.stderr)
            break
        nvalid, span, vovf, hovf = jax.device_get(probe_j(batch))
        take = min(cfg.data.batch_size, args.scenes - seen)
        max_sites = np.maximum(max_sites, nvalid[:take].max(axis=0))
        max_span = np.maximum(max_span, span[:take].max(axis=0))
        vovf_total += int(vovf)
        hovf_total += int(hovf)
        seen += take
    loader.close()

    def round_up(v, m):
        return -(-int(v) // m) * m

    rows, suggested = [], []
    for s in range(ns):
        sat = max_sites[s] >= caps[s]
        sug = round_up(max(max_sites[s] * args.margin, 128), 128)
        suggested.append(int(min(sug, caps[0])) if s else int(caps[0]))
        rows.append({
            "scale": s, "cap": int(caps[s]), "max_sites": int(max_sites[s]),
            "occupancy": round(float(max_sites[s]) / caps[s], 3),
            "suggested": suggested[-1], "saturated": bool(sat),
        })
    ext = cfg.model.backbone.grid_extent
    down = 1 << (ns - 1)
    sug_ext = [round_up(int(v), down) for v in max_span]
    # For crop-bounded configs (data.crop_to_bounds) the extent can be
    # sized from the DECLARED bounds, not the sampled scenes: coverage is
    # guaranteed by the crop (bounds/voxel + 2*rebase_margin cells), so
    # the safe extent is the bound-derived one rounded up to the coarsest
    # stride — this is how the 448-xy landing in the 8 m-bounded configs
    # was derived (VERDICT r4 item 6).
    bounded_ext = None
    if cfg.data.crop_to_bounds and cfg.data.scene_bounds is not None:
        bounded_ext = [
            round_up(int(np.ceil(b / v)) + 4, down)
            for b, v in zip(cfg.data.scene_bounds, cfg.data.voxel_size)]
    report = {
        "config": cfg.name, "split": args.split, "scenes": seen,
        "augmented": train, "margin": args.margin,
        "scales": rows,
        "voxel_overflow": vovf_total, "hierarchy_overflow": hovf_total,
        "max_span_cells": [int(v) for v in max_span],
        "grid_extent": list(ext) if ext else None,
        "suggested_extent_lower_bound": sug_ext,
        "suggested_extent_from_bounds": bounded_ext,
    }
    print(json.dumps(report, indent=2))
    sat_scales = [r["scale"] for r in rows if r["saturated"]]
    if sat_scales:
        print(f"# WARNING: scales {sat_scales} saturated their capacity — "
              f"rows were dropped; suggestions there are lower bounds. "
              f"Raise those caps and re-run.", file=sys.stderr)
    if vovf_total or hovf_total:
        print(f"# WARNING: overflow during measurement (voxel={vovf_total}, "
              f"hierarchy={hovf_total}) — counts are clipped at capacity.",
              file=sys.stderr)
    print("# paste into the config (model.backbone):", file=sys.stderr)
    print(f"#   capacities: {suggested}", file=sys.stderr)
    if ext:
        slack = [int(e) - int(v) for e, v in zip(ext, max_span)]
        print(f"#   grid_extent slack (cells beyond measured span): {slack} "
              f"— measured lower bound {sug_ext}; size via data.scene_bounds "
              f"for headroom beyond the sampled scenes", file=sys.stderr)
    if bounded_ext:
        print(f"#   grid_extent: {bounded_ext}  # guaranteed by "
              f"crop_to_bounds + scene_bounds (coverage does not depend on "
              f"the sampled scenes)", file=sys.stderr)


if __name__ == "__main__":
    main()
