"""Sparse UNet backbone (SURVEY.md C9).

Encoder: per scale, residual submanifold blocks, then a kernel-2/stride-2
sparse conv to the next-coarser site set. Decoder: inverse conv back up,
skip-concat with the encoder features on the *same cached site set*, then
more submanifold blocks. "Tiny" (BASELINE config 1) vs "full" (config 2)
variants differ only in `widths`/`blocks_per_scale` via BackboneConfig.

The forward consumes a prebuilt hierarchy (:mod:`..ops.hierarchy`) so every
layer reuses the same rulebooks, mirroring the reference's coordinate-
manager caching behavior with pure functions.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.hierarchy import ScaleSet
from .layers import MaskedBatchNorm, SparseBasicBlock, SparseConv, SubMConv3d


def _mask(scale: ScaleSet) -> jax.Array:
    m = scale.coords.shape[1]
    return jnp.arange(m, dtype=jnp.int32)[None, :] < scale.nvalid[:, None]


class SparseUNet(nn.Module):
    """Returns per-scale decoder features, finest first.

    out[s] has shape [B, M_s, widths[s]] on the scale-s site set.
    """

    widths: Sequence[int]
    blocks_per_scale: int = 1
    kernel_size: int = 3
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, feats: jax.Array, scales: List[ScaleSet], train: bool = False):
        ns = len(self.widths)
        assert len(scales) == ns, (len(scales), ns)
        block_cls = (
            nn.remat(SparseBasicBlock, static_argnums=(4,))
            if self.remat else SparseBasicBlock
        )

        x = SubMConv3d(self.widths[0], self.kernel_size, dtype=self.dtype, name="stem")(
            feats, scales[0].subm_idx
        )

        # encoder
        skips = []
        for s in range(ns):
            for b in range(self.blocks_per_scale):
                x = block_cls(
                    self.widths[s], self.kernel_size, dtype=self.dtype,
                    name=f"enc{s}_block{b}",
                )(x, scales[s].subm_idx, _mask(scales[s]), train)
            skips.append(x)
            if s < ns - 1:
                x = MaskedBatchNorm(dtype=self.dtype, name=f"down{s}_bn")(
                    x, _mask(scales[s]), train
                )
                x = nn.relu(x)
                x = SparseConv(
                    self.widths[s + 1], 8, dtype=self.dtype, name=f"down{s}_conv"
                )(x, scales[s].down_idx, scales[s].up_idx)  # t(down) == up

        # decoder
        outputs = [None] * ns
        outputs[ns - 1] = x
        for s in range(ns - 2, -1, -1):
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
            outputs[s] = x
        return outputs
