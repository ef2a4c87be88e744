"""Useful-work (sparse-equivalent) FLOP accounting (VERDICT r2 item 8).

The HLO cost analysis counts every FLOP the compiled program executes —
including dense-tail convolutions over EMPTY grid cells, which are padding,
not work. That flatters MFU and lets layout changes (more dense, more
padding) masquerade as progress. This module counts the *useful* forward
FLOPs instead: for every conv, ``2 · (realized kernel-tap pairs) · Cin ·
Cout``, where the pair counts come from the actual rulebooks of the batch
(SURVEY.md §3.3: the rulebook IS the list of realized input→output pairs).
Dense-tail scales are counted by the same formula — the useful work of a
dense masked conv is exactly its submanifold-equivalent pair count, which
we obtain by building rulebooks for those scales too (bench-only; the
production forward skips them).

Heads are static-shape by design (BASELINE: "fused dense-padded kernels
with static shapes"), so their nominal FLOPs are their useful FLOPs.

All counts are per BATCH, forward pass only. Backward ≈ 2x forward for
convs (d_feats + d_W); callers wanting train MFU can use 3x forward as the
standard approximation.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def collect_rulebook_stats(cfg, batch) -> Dict[str, List[float]]:
    """Run the device front half (voxelize + hierarchy with rulebooks at
    EVERY scale) and count sites + realized pairs per scale for ``batch``."""
    from ..ops import hierarchy as H
    from ..ops import voxelize as V

    ns = len(cfg.model.backbone.widths)

    @jax.jit
    def stats_fn(b):
        st, _, _ = V.voxelize_batch(
            b["points"], b["feats"], b["valid"],
            jnp.asarray(cfg.data.voxel_size), cfg.data.voxel_capacity,
        )
        st, _ = V.rebase_coords(st, margin=2)
        # subm_scales=None: build subm rulebooks at dense-tail scales too so
        # their useful (submanifold-equivalent) pair counts are exact
        scales, _ = H.build_hierarchy(
            st, ns, cfg.scale_capacities(), cfg.model.backbone.kernel_size,
            subm_scales=None,
        )
        sites = [jnp.sum(s.nvalid).astype(jnp.float32) for s in scales]
        subm_pairs = [
            jnp.sum(s.subm_idx >= 0).astype(jnp.float32) for s in scales
        ]
        down_pairs = [
            jnp.sum(s.down_idx >= 0).astype(jnp.float32)
            for s in scales[:-1]
        ]
        return sites, subm_pairs, down_pairs

    sites, subm, down = jax.device_get(stats_fn(batch))
    return {
        "sites": [float(x) for x in sites],
        "subm_pairs": [float(x) for x in subm],
        "down_pairs": [float(x) for x in down],
    }


def useful_forward_flops(cfg, stats: Dict[str, List[float]]) -> float:
    """Sparse-equivalent forward FLOPs per batch from measured rulebooks."""
    mc = cfg.model
    ws = mc.backbone.widths
    ns = len(ws)
    bps = mc.backbone.blocks_per_scale
    sites = stats["sites"]
    sp = stats["subm_pairs"]
    dp = stats["down_pairs"]

    def conv(pairs, cin, cout):
        return 2.0 * pairs * cin * cout

    f = 0.0
    # ---- UNet backbone (dense tail counted as-if-sparse: same math) -----
    f += conv(sp[0], cfg.data.num_features, ws[0])          # stem
    for s in range(ns):                                      # encoder
        for _ in range(bps):
            f += conv(sp[s], ws[s], ws[s]) * 2               # conv1+conv2
        if s < ns - 1:
            f += conv(dp[s], ws[s], ws[s + 1])               # down
    for s in range(ns - 2, -1, -1):                          # decoder
        f += conv(dp[s], ws[s + 1], ws[s])                   # up (t(up)=down)
        cin = 2 * ws[s]                                      # skip concat
        f += conv(sp[s], cin, ws[s]) + conv(sp[s], ws[s], ws[s])
        f += conv(sites[s], cin, ws[s])                      # 1-tap proj
        for _ in range(bps - 1):
            f += conv(sp[s], ws[s], ws[s]) * 2

    # ---- RPN heads (per-row MLPs on live rows) --------------------------
    h = mc.rpn.hidden
    for s in mc.rpn.rpn_scales or (mc.rpn.rpn_scale,):
        f += 2.0 * sites[s] * (ws[s] * h + h * h + h * 7)

    # ---- RoI + mask head (static dense-padded by design) ----------------
    b = cfg.data.batch_size
    p = mc.rpn.num_proposals
    d3 = mc.roi.grid_size ** 3
    rh = mc.roi.hidden
    rois = float(b * p)
    f += 2.0 * rois * d3 * 27 * (ws[0] * rh + rh * rh)       # conv1+conv2
    f += 2.0 * rois * d3 * 8 * rh * rh                       # 2x2x2 up
    f += 2.0 * rois * (2 * mc.roi.grid_size) ** 3 * rh       # mask 1x1x1
    f += 2.0 * rois * (rh * rh + rh * (mc.num_classes + 1))  # cls MLP

    # ---- semantic head --------------------------------------------------
    if mc.use_semantic_head:
        f += 2.0 * sites[0] * (ws[0] * 64 + 64 * (mc.num_classes + 1))
    return float(f)
