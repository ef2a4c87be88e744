"""Pure-PyTorch-CPU twin of BASELINE config 1 — the benchmark denominator.

BASELINE.md: the reference publishes no numbers and its mount is empty
(SURVEY.md §0), so the "≥5× CPU-reference" target needs a measured
denominator. This twin reproduces the reference pipeline the way the
PyTorch submanifold-sparse-conv family implements it on CPU (SURVEY.md
§3.3): dict hash-map coordinate lookup → per-offset rulebook of
(in_row, out_row) pairs → gather → GEMM → scatter-add, for a tiny UNet +
whole-scene mask/cls head at 5 cm voxels. **This is a substitute for the
unavailable reference and is labeled as such in all reported results.**

Torch is used CPU-only and only inside benchmarks/ (never in the
framework's compute path).
"""

from __future__ import annotations

import time
from typing import Dict, List, Tuple

import numpy as np
import torch


def voxelize(points: np.ndarray, feats: np.ndarray, voxel_size: float):
    ic = np.floor(points / voxel_size).astype(np.int64)
    uniq, inv = np.unique(ic, axis=0, return_inverse=True)
    m = len(uniq)
    sums = np.zeros((m, feats.shape[1]), np.float32)
    np.add.at(sums, inv, feats)
    counts = np.bincount(inv, minlength=m).astype(np.float32)
    return uniq, sums / counts[:, None], inv


def kernel_offsets(k: int, centered=True):
    r = range(-(k // 2), k - k // 2) if centered else range(k)
    return [(dx, dy, dz) for dx in r for dy in r for dz in r]


class CoordHash:
    """Reference-style coordinate hash map (python dict on CPU)."""

    def __init__(self, coords: np.ndarray):
        self.coords = coords
        self.lut = {tuple(c): i for i, c in enumerate(coords)}

    def rulebook(self, offsets) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Per offset: (in_rows, out_rows) pair arrays."""
        rules = []
        for off in offsets:
            ins, outs = [], []
            for i, c in enumerate(self.coords):
                j = self.lut.get((c[0] - off[0], c[1] - off[1], c[2] - off[2]))
                if j is not None:
                    ins.append(j)
                    outs.append(i)
            rules.append((np.asarray(ins, np.int64), np.asarray(outs, np.int64)))
        return rules


def subm_conv(feats: torch.Tensor, rules, weight: torch.Tensor) -> torch.Tensor:
    """Gather → GEMM → scatter-add over the rulebook (reference hot loop)."""
    m = feats.shape[0]
    out = torch.zeros((m, weight.shape[-1]), dtype=feats.dtype)
    for k, (ins, outs) in enumerate(rules):
        if len(ins) == 0:
            continue
        gathered = feats[torch.from_numpy(ins)]
        partial = gathered @ weight[k]
        out.index_add_(0, torch.from_numpy(outs), partial)
    return out


def down_rules(coords: np.ndarray):
    """Kernel-2/stride-2 downsample: coarse site set + per-offset pairs."""
    coarse = coords // 2
    uniq, inv = np.unique(coarse, axis=0, return_inverse=True)
    offsets = kernel_offsets(2, centered=False)
    child = coords - coarse * 2
    rules = []
    for k, off in enumerate(offsets):
        sel = np.all(child == np.asarray(off), axis=1)
        rules.append((np.nonzero(sel)[0].astype(np.int64), inv[sel].astype(np.int64)))
    return uniq, inv, rules


class TinyUNetTorch:
    """Tiny 2-scale UNet + whole-scene mask/cls head (config-1 twin)."""

    def __init__(self, cin: int, widths=(16, 32), num_classes: int = 6, seed: int = 0):
        g = torch.Generator().manual_seed(seed)
        def w(k, a, b):
            return torch.randn((k, a, b), generator=g) * (2.0 / (k * a)) ** 0.5
        self.stem = w(27, cin, widths[0])
        self.enc0 = w(27, widths[0], widths[0])
        self.down = w(8, widths[0], widths[1])
        self.enc1 = w(27, widths[1], widths[1])
        self.up = w(8, widths[1], widths[0])
        self.dec0 = w(27, 2 * widths[0], widths[0])
        self.mask_head = torch.randn((widths[0], 1), generator=g) * 0.1
        self.cls_head = torch.randn((widths[0], num_classes + 1), generator=g) * 0.1

    @torch.no_grad()
    def forward(self, coords: np.ndarray, feats: np.ndarray):
        x = torch.from_numpy(feats)
        h = CoordHash(coords)
        offs = kernel_offsets(3)
        rules0 = h.rulebook(offs)
        x = subm_conv(x, rules0, self.stem).relu()
        x = subm_conv(x, rules0, self.enc0).relu()
        skip = x
        # downsample
        ccoords, inv, drules = down_rules(coords)
        y = torch.zeros((len(ccoords), self.down.shape[-1]))
        for k, (ins, outs) in enumerate(drules):
            if len(ins):
                y.index_add_(0, torch.from_numpy(outs),
                             x[torch.from_numpy(ins)] @ self.down[k])
        y = y.relu()
        ch = CoordHash(ccoords)
        y = subm_conv(y, ch.rulebook(offs), self.enc1).relu()
        # upsample (inverse of down: each fine row reads its parent)
        parent = torch.from_numpy(inv)
        child = coords - (coords // 2) * 2
        kidx = child[:, 0] * 4 + child[:, 1] * 2 + child[:, 2]
        up = torch.einsum("mc,mcd->md",
                          y[parent],
                          torch.from_numpy(
                              np.ascontiguousarray(self.up.numpy()[kidx])
                          ))
        x = torch.cat([up.relu(), skip], dim=1)
        x = subm_conv(x, rules0, self.dec0).relu()
        mask_logits = x @ self.mask_head       # per-voxel mask (1 whole-scene RoI)
        cls_logits = (x.mean(0) @ self.cls_head)
        return mask_logits.numpy(), cls_logits.numpy()


class DeepUNetTorch:
    """N-scale reference-style UNet twin (config-2 shape when widths has 5
    entries and blocks_per_scale=2): dict-hash rulebooks + gather-GEMM-
    scatter submanifold blocks per scale, k2s2 down/up, skip-concat."""

    def __init__(self, cin: int, widths, blocks_per_scale: int = 1,
                 num_classes: int = 18, seed: int = 0):
        g = torch.Generator().manual_seed(seed)
        def w(k, a, b):
            return torch.randn((k, a, b), generator=g) * (2.0 / (k * a)) ** 0.5
        self.widths = tuple(widths)
        self.blocks = blocks_per_scale
        ns = len(self.widths)
        self.stem = w(27, cin, widths[0])
        self.enc = [[w(27, widths[s], widths[s]) for _ in range(2 * blocks_per_scale)]
                    for s in range(ns)]
        self.down = [w(8, widths[s], widths[s + 1]) for s in range(ns - 1)]
        self.up = [w(8, widths[s + 1], widths[s]) for s in range(ns - 1)]
        self.dec_in = [w(27, 2 * widths[s], widths[s]) for s in range(ns - 1)]
        self.dec = [[w(27, widths[s], widths[s])
                     for _ in range(2 * blocks_per_scale - 1)]
                    for s in range(ns - 1)]
        self.mask_head = torch.randn((widths[0], 1), generator=g) * 0.1
        self.cls_head = torch.randn((widths[0], num_classes + 1), generator=g) * 0.1

    @torch.no_grad()
    def forward(self, coords: np.ndarray, feats: np.ndarray):
        ns = len(self.widths)
        offs = kernel_offsets(3)
        x = torch.from_numpy(feats)
        level_coords, level_rules, skips, downs = [], [], [], []
        for s in range(ns):
            h = CoordHash(coords)
            rules = h.rulebook(offs)
            level_coords.append(coords)
            level_rules.append(rules)
            if s == 0:
                x = subm_conv(x, rules, self.stem).relu()
            for wk in self.enc[s]:
                x = subm_conv(x, rules, wk).relu()
            skips.append(x)
            if s < ns - 1:
                ccoords, inv, drules = down_rules(coords)
                y = torch.zeros((len(ccoords), self.down[s].shape[-1]))
                for k, (ins, outs) in enumerate(drules):
                    if len(ins):
                        y.index_add_(0, torch.from_numpy(outs),
                                     x[torch.from_numpy(ins)] @ self.down[s][k])
                x = y.relu()
                downs.append((inv, coords))
                coords = ccoords
        for s in range(ns - 2, -1, -1):
            inv, fcoords = downs[s]
            child = fcoords - (fcoords // 2) * 2
            kidx = child[:, 0] * 4 + child[:, 1] * 2 + child[:, 2]
            upw = np.ascontiguousarray(self.up[s].numpy()[kidx])
            up = torch.einsum("mc,mcd->md", x[torch.from_numpy(inv)],
                              torch.from_numpy(upw)).relu()
            x = torch.cat([up, skips[s]], dim=1)
            x = subm_conv(x, level_rules[s], self.dec_in[s]).relu()
            for wk in self.dec[s]:
                x = subm_conv(x, level_rules[s], wk).relu()
        mask = x @ self.mask_head
        cls = x.mean(0, keepdim=True) @ self.cls_head
        return mask, cls


def measure_scenes_per_sec(
    scenes: List[Dict[str, np.ndarray]],
    voxel_size: float = 0.05,
    widths=(16, 32),
    num_classes: int = 6,
    repeats: int = 1,
    blocks_per_scale: int = 0,
) -> Tuple[float, Dict]:
    """Full reference-style pipeline timing: voxelize + rulebooks + net.

    ``blocks_per_scale`` > 0 switches to the deep N-scale twin (config-2
    shape); 0 keeps the original tiny 2-scale twin (config-1 shape).
    """
    torch.set_num_threads(torch.get_num_threads())  # default threading
    model = None
    t0 = time.perf_counter()
    nvox = []
    for _ in range(repeats):
        for s in scenes:
            coords, vfeats, _ = voxelize(s["points"], s["feats"], voxel_size)
            nvox.append(len(coords))
            if model is None:
                if blocks_per_scale:
                    model = DeepUNetTorch(vfeats.shape[1], widths,
                                          blocks_per_scale, num_classes)
                else:
                    model = TinyUNetTorch(vfeats.shape[1], widths, num_classes)
            model.forward(coords, vfeats)
    dt = time.perf_counter() - t0
    n = len(scenes) * repeats
    return n / dt, {"scenes": n, "seconds": dt, "mean_voxels": float(np.mean(nvox))}
