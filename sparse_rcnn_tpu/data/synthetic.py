"""Synthetic labeled scenes — the hermetic stand-in for ScanNet-format data.

No dataset ships with this repo (and the reference tree was empty at survey
— SURVEY.md §0), so tests, golden e2e runs, and benchmarks use generated
scenes: a floor slab of background points plus K box-shaped instance blobs
with per-point instance/semantic labels. Deterministic per (seed, index).

Returns the same padded dict the real dataset readers produce, so the rest
of the pipeline cannot tell the difference.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def generate_scene(
    seed: int,
    num_points: int = 16384,
    num_instances: int = 6,
    num_classes: int = 18,
    num_features: int = 3,
    extent: float = 8.0,
) -> Dict[str, np.ndarray]:
    """One labeled scene, capacity-padded to ``num_points``.

    Keys: points [N,3] f32, feats [N,C] f32, valid bool[N],
    point_instance int32[N] (-1 = background), point_semantic int32[N]
    (-1 = unlabeled ceiling/noise; floor gets class 0-free encoding: walls/
    floor are labeled with a random non-instance class as well).
    """
    rng = np.random.default_rng(seed)
    n_bg = num_points // 3
    n_fg = num_points - n_bg

    # background: floor slab
    bg_pts = np.stack(
        [
            rng.uniform(0, extent, n_bg),
            rng.uniform(0, extent, n_bg),
            rng.uniform(0, 0.15, n_bg),
        ],
        axis=1,
    )
    bg_inst = np.full(n_bg, -1, np.int32)
    bg_sem = np.full(n_bg, -1, np.int32)

    # instances: axis-aligned blobs above the floor with CLASS-CORRELATED
    # features (a deterministic per-class "color" + noise) so semantic
    # prediction is learnable — real datasets carry appearance cues too
    class_rng = np.random.default_rng(12345)
    class_colors = class_rng.uniform(-1, 1, (num_classes, num_features))

    k = int(rng.integers(max(1, num_instances - 2), num_instances + 1))
    per = n_fg // k
    fg_pts, fg_inst, fg_sem, fg_feat = [], [], [], []
    for i in range(k):
        center = rng.uniform(1.0, extent - 1.0, 3)
        center[2] = rng.uniform(0.3, 1.5)
        size = rng.uniform(0.3, 1.2, 3)
        cnt = per if i < k - 1 else n_fg - per * (k - 1)
        pts = center + rng.uniform(-0.5, 0.5, (cnt, 3)) * size
        cls = int(rng.integers(0, num_classes))
        fg_pts.append(pts)
        fg_inst.append(np.full(cnt, i, np.int32))
        fg_sem.append(np.full(cnt, cls, np.int32))
        fg_feat.append(class_colors[cls] + rng.normal(0, 0.3, (cnt, num_features)))

    points = np.concatenate([bg_pts] + fg_pts).astype(np.float32)
    inst = np.concatenate([bg_inst] + fg_inst)
    sem = np.concatenate([bg_sem] + fg_sem)
    bg_feat = rng.normal(0, 0.3, (n_bg, num_features))
    feats = np.concatenate([bg_feat] + fg_feat).astype(np.float32)

    perm = rng.permutation(num_points)
    return {
        "points": points[perm],
        "feats": feats[perm],
        "valid": np.ones(num_points, bool),
        "point_instance": inst[perm],
        "point_semantic": sem[perm],
    }


def generate_batch(seed: int, batch_size: int, **kw) -> Dict[str, np.ndarray]:
    scenes = [generate_scene(seed * 1000 + i, **kw) for i in range(batch_size)]
    return {k: np.stack([s[k] for s in scenes]) for k in scenes[0]}
