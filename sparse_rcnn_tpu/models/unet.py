"""Sparse UNet backbone with an optional dense tail (SURVEY.md C9).

Encoder: per scale, residual submanifold blocks, then a kernel-2/stride-2
sparse conv to the next-coarser site set. Decoder: inverse conv back up,
skip-concat with the encoder features on the *same cached site set*, then
more submanifold blocks. "Tiny" (BASELINE config 1) vs "full" (config 2)
variants differ only in `widths`/`blocks_per_scale` via BackboneConfig.

**Dense tail** (``dense_from_scale``): from that scale down, features are
scattered onto a dense [E/2^s]³ grid and the blocks run as MASKED dense 3D
convs on the MXU. This is mathematically identical to the submanifold path
— empty cells carry zero features, so a dense conv sums exactly the active
neighbors, and re-masking restores output sites == input sites (asserted
by tests/parity/test_dense_tail.py) — but replaces the random row gathers
(the v5e's slowest primitive, ~2.7 ms per million rows even in bf16) with
dense convolutions at high MXU utilization, and those scales need no
rulebooks at all. At stride >= 4 occupancy is high enough that the dense
FLOP overhead is far cheaper than the gathers it replaces.

The forward consumes a prebuilt hierarchy (:mod:`..ops.hierarchy`) so every
layer reuses the same rulebooks, mirroring the reference's coordinate-
manager caching behavior with pure functions.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import pooling as pool_ops
from ..ops.batching import map_scenes as _map_scenes
from ..ops.hierarchy import ScaleSet
from .layers import (
    MaskedBatchNorm, SparseBasicBlock, SparseConv, SparseDropout, SubMConv3d,
)


def _mask(scale: ScaleSet) -> jax.Array:
    m = scale.coords.shape[1]
    return jnp.arange(m, dtype=jnp.int32)[None, :] < scale.nvalid[:, None]


def scatter_to_grid(
    coords: jax.Array, nvalid: jax.Array, feats: jax.Array, extent
) -> Tuple[jax.Array, jax.Array]:
    """Sparse rows → dense grid. Returns (grid [B,Dx,Dy,Dz,C], occ bool[B,Dx,Dy,Dz]).

    Out-of-extent sites are dropped (distinct OOB scatter slots — see
    coords.py on why duplicate indices must be avoided).
    """
    dx, dy, dz = extent
    b, m, c = feats.shape
    cells = dx * dy * dz

    def one(cc, nv, f):
        mask = jnp.arange(m, dtype=jnp.int32) < nv
        inb = mask & jnp.all(
            (cc >= 0) & (cc < jnp.array([dx, dy, dz], jnp.int32)), axis=-1
        )
        flat = (cc[:, 0] * dy + cc[:, 1]) * dz + cc[:, 2]
        dst = jnp.where(inb, flat, cells + jnp.arange(m, dtype=jnp.int32))
        grid = jnp.zeros((cells, c), f.dtype).at[dst].set(
            f, mode="drop", unique_indices=True
        )
        occ = jnp.zeros((cells,), bool).at[dst].set(
            inb, mode="drop", unique_indices=True
        )
        return grid.reshape(dx, dy, dz, c), occ.reshape(dx, dy, dz)

    # batch policy (ops/batching.py): unroll single-chip, vmap under GSPMD
    # so every device only touches its own scenes at the dense-tail seam
    return _map_scenes(one, coords, nvalid, feats)


def gather_from_grid(
    grid: jax.Array, coords: jax.Array, nvalid: jax.Array
) -> jax.Array:
    """Dense grid [B,Dx,Dy,Dz,C] → rows at each (in-extent, live) site."""
    b, dx, dy, dz, c = grid.shape
    m = coords.shape[1]

    def one(g, cc, nv):
        mask = jnp.arange(m, dtype=jnp.int32) < nv
        inb = mask & jnp.all(
            (cc >= 0) & (cc < jnp.array([dx, dy, dz], jnp.int32)), axis=-1
        )
        flat = (cc[:, 0] * dy + cc[:, 1]) * dz + cc[:, 2]
        rows = g.reshape(-1, c)[jnp.where(inb, flat, 0)]
        return rows * inb[:, None].astype(rows.dtype)

    return _map_scenes(one, grid, coords, nvalid)


class DenseBasicBlock(nn.Module):
    """Residual block of masked dense 3D convs — the submanifold block's
    exact dense twin (pre-activation, re-masked after every conv)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, occ, train: bool):
        b = x.shape[0]
        flat_occ = occ.reshape(b, -1)

        def bn(h, name):
            hf = MaskedBatchNorm(dtype=self.dtype, name=name)(
                h.reshape(b, -1, h.shape[-1]), flat_occ, train
            )
            return hf.reshape(h.shape)

        om = occ[..., None].astype(self.dtype)
        residual = x
        h = nn.relu(bn(x, "bn1"))
        h = nn.Conv(self.features, (3, 3, 3), use_bias=False,
                    dtype=self.dtype, name="conv1")(h) * om
        h = nn.relu(bn(h, "bn2"))
        h = nn.Conv(self.features, (3, 3, 3), use_bias=False,
                    dtype=self.dtype, name="conv2")(h) * om
        if residual.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1, 1), use_bias=False,
                               dtype=self.dtype, name="proj")(residual) * om
        return h + residual


class DenseTail(nn.Module):
    """Dense UNet sub-tree over scales [start, ns): encoder blocks + k2s2
    downsample, mirror decoder with skip-concat. Input/output live on the
    ``start`` scale's grid; per-scale decoder grids are also returned so
    callers can project them back onto the sparse site sets."""

    widths: Sequence[int]              # full per-scale widths
    start: int
    blocks_per_scale: int = 1
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, grid, occ, train: bool):
        ns = len(self.widths)
        block_cls = (
            nn.remat(DenseBasicBlock, static_argnums=(3,))
            if self.remat else DenseBasicBlock
        )
        b = grid.shape[0]

        x, skips, occs = grid, [], []
        for s in range(self.start, ns):
            for blk in range(self.blocks_per_scale):
                x = block_cls(self.widths[s], dtype=self.dtype,
                              name=f"enc{s}_block{blk}")(x, occ, train)
            skips.append(x)
            occs.append(occ)
            if s < ns - 1:
                xf = MaskedBatchNorm(dtype=self.dtype, name=f"down{s}_bn")(
                    x.reshape(b, -1, x.shape[-1]), occ.reshape(b, -1), train
                ).reshape(x.shape)
                x = nn.relu(xf)
                occ = nn.max_pool(
                    occ[..., None].astype(jnp.float32),
                    (2, 2, 2), strides=(2, 2, 2),
                )[..., 0] > 0.5
                x = nn.Conv(
                    self.widths[s + 1], (2, 2, 2), strides=(2, 2, 2),
                    use_bias=False, dtype=self.dtype, name=f"down{s}_conv",
                )(x) * occ[..., None].astype(self.dtype)

        outputs = [None] * (ns - self.start)
        outputs[-1] = x
        for s in range(ns - 2, self.start - 1, -1):
            i = s - self.start
            up_occ, fine_occ = occs[i + 1], occs[i]
            up = MaskedBatchNorm(dtype=self.dtype, name=f"up{s}_bn")(
                outputs[i + 1].reshape(b, -1, outputs[i + 1].shape[-1]),
                up_occ.reshape(b, -1), train,
            ).reshape(outputs[i + 1].shape)
            up = nn.relu(up)
            up = nn.ConvTranspose(
                self.widths[s], (2, 2, 2), strides=(2, 2, 2),
                use_bias=False, dtype=self.dtype, name=f"up{s}_conv",
            )(up) * fine_occ[..., None].astype(self.dtype)
            x = jnp.concatenate([up, skips[i]], axis=-1)
            for blk in range(self.blocks_per_scale):
                x = block_cls(self.widths[s], dtype=self.dtype,
                              name=f"dec{s}_block{blk}")(x, fine_occ, train)
            outputs[i] = x
        return outputs


class SparseUNet(nn.Module):
    """Returns per-scale decoder features, finest first.

    out[s] has shape [B, M_s, widths[s]] on the scale-s site set.
    """

    widths: Sequence[int]
    blocks_per_scale: int = 1
    kernel_size: int = 3
    dtype: Any = jnp.float32
    remat: bool = False
    dense_from_scale: Optional[int] = None
    grid_extent: Optional[Tuple[int, int, int]] = None
    # "conv" | "maxpool" | "avgpool" — sparse-scale downsample operator
    # (pooling reuses the same k==s rulebook + a 1x1 channel projection;
    # SURVEY.md C6). The dense tail always downsamples with strided convs.
    downsample: str = "conv"
    # feature dropout after each sparse block stack (SURVEY.md C8)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, feats: jax.Array, scales: List[ScaleSet],
                 train: bool = False, profile_cut: Optional[str] = None):
        """``profile_cut`` (static, profiling only — benchmarks/profile_stages
        ``fwdsplit``): return early after the named stage ("encoder" |
        "dense_tail") so stage costs can be attributed by jit-timing nested
        prefixes of the SAME network (XLA dead-code-eliminates the rest;
        Flax ignores the unused params at apply time)."""
        ns = len(self.widths)
        assert len(scales) == ns, (len(scales), ns)
        n_sparse = self.dense_from_scale if self.dense_from_scale else ns
        # validate profile_cut BEFORE tracing the forward: a bad cut must
        # fail fast, not trip a bare assert after the whole sparse forward
        # has been traced (round-3 advisor finding)
        if profile_cut is not None:
            if profile_cut not in ("encoder", "dense_tail"):
                raise ValueError(f"unknown profile_cut {profile_cut!r} "
                                 "(expected 'encoder' or 'dense_tail')")
            if profile_cut == "dense_tail" and n_sparse >= ns:
                raise ValueError("profile_cut='dense_tail' on a fully-"
                                 "sparse backbone (dense_from_scale unset)")
        block_cls = (
            nn.remat(SparseBasicBlock, static_argnums=(4,))
            if self.remat else SparseBasicBlock
        )

        x = SubMConv3d(self.widths[0], self.kernel_size, dtype=self.dtype, name="stem")(
            feats, scales[0].subm_idx
        )

        # sparse encoder (scales [0, n_sparse); the down conv at the last
        # sparse scale still produces features ON the next scale's site set)
        skips = []
        for s in range(n_sparse):
            for b in range(self.blocks_per_scale):
                x = block_cls(
                    self.widths[s], self.kernel_size, dtype=self.dtype,
                    name=f"enc{s}_block{b}",
                )(x, scales[s].subm_idx, _mask(scales[s]), train)
            if self.dropout > 0:
                x = SparseDropout(self.dropout, name=f"enc{s}_drop")(x, train)
            skips.append(x)
            if s < ns - 1:
                x = MaskedBatchNorm(dtype=self.dtype, name=f"down{s}_bn")(
                    x, _mask(scales[s]), train
                )
                x = nn.relu(x)
                if self.downsample == "conv":
                    x = SparseConv(
                        self.widths[s + 1], 8, dtype=self.dtype,
                        name=f"down{s}_conv",
                    )(x, scales[s].down_idx, scales[s].up_idx)  # t(down) == up
                else:
                    pool = (pool_ops.max_pool if self.downsample == "maxpool"
                            else pool_ops.avg_pool)
                    x = pool(x, scales[s].down_idx)
                    x = nn.Dense(
                        self.widths[s + 1], use_bias=False, dtype=self.dtype,
                        name=f"down{s}_proj",
                    )(x)
                    x = x * _mask(scales[s + 1])[..., None].astype(x.dtype)

        if profile_cut == "encoder":
            return [x]

        outputs = [None] * ns
        if n_sparse < ns:
            # dense tail over scales [n_sparse, ns)
            s0 = n_sparse
            ext = tuple(e >> s0 for e in self.grid_extent)
            grid, occ = scatter_to_grid(
                scales[s0].coords, scales[s0].nvalid, x, ext
            )
            dense_outs = DenseTail(
                widths=self.widths, start=s0,
                blocks_per_scale=self.blocks_per_scale, dtype=self.dtype,
                remat=self.remat, name="dense_tail",
            )(grid, occ, train)
            # project every dense scale's decoder output back onto its
            # sparse site set (keeps the per-scale output API identical)
            for s in range(s0, ns):
                outputs[s] = gather_from_grid(
                    dense_outs[s - s0], scales[s].coords, scales[s].nvalid
                )
            x = outputs[s0]
        else:
            outputs[ns - 1] = x
        if profile_cut == "dense_tail":
            return outputs[n_sparse:]

        # sparse decoder: transitions s+1 → s for every sparse scale (the
        # topmost consumed output is the dense tail's projection when a
        # tail exists, else the coarsest sparse encoder output)
        dec_top = n_sparse - 1 if n_sparse < ns else ns - 2
        for s in range(dec_top, -1, -1):
            up = MaskedBatchNorm(dtype=self.dtype, name=f"up{s}_bn")(
                outputs[s + 1], _mask(scales[s + 1]), train
            )
            up = nn.relu(up)
            up = SparseConv(
                self.widths[s], 8, dtype=self.dtype, name=f"up{s}_conv"
            )(up, scales[s].up_idx, scales[s].down_idx)  # t(up) == down
            x = jnp.concatenate([up, skips[s]], axis=-1)
            for b in range(self.blocks_per_scale):
                x = block_cls(
                    self.widths[s], self.kernel_size, dtype=self.dtype,
                    name=f"dec{s}_block{b}",
                )(x, scales[s].subm_idx, _mask(scales[s]), train)
            if self.dropout > 0:
                x = SparseDropout(self.dropout, name=f"dec{s}_drop")(x, train)
            outputs[s] = x
        return outputs
