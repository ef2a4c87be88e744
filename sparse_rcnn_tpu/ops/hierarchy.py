"""Multi-scale site-set hierarchy: coords + rulebooks for a sparse UNet.

The reference caches rulebooks in a coordinate manager keyed by (site set,
kernel, stride) (SURVEY.md §3.3; tree empty at survey, §0). Here the whole
hierarchy is built *once per forward pass* as a pure function of the input
site set — coords never change during a forward/backward, so every layer on
the same scale shares these tables. Keeping rulebook construction out of
the parameterized model also keeps linen modules shape-only.

Gradients do not flow through rulebooks (integer tables); everything is
``vmap``-ed over the batch axis.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import struct

from typing import TYPE_CHECKING

from . import rulebook as rb

if TYPE_CHECKING:  # avoid circular import; SparseTensor used as annotation only
    from ..sparse import SparseTensor


@struct.dataclass
class ScaleSet:
    """Site set + rulebooks at one scale of the hierarchy.

    coords:   int32[B, M_s, 3] (sorted per scene, sentinel padding)
    nvalid:   int32[B]
    subm_idx: int32[B, K, M_s] submanifold rulebook at this scale
    down_idx: int32[B, 8, M_{s+1}] strided rulebook into the next-coarser
              scale (None at the coarsest scale)
    up_idx:   int32[B, 8, M_s] inverse rulebook from the next-coarser scale
              back to this one (None at the coarsest scale)
    """

    coords: jax.Array
    nvalid: jax.Array
    subm_idx: Optional[jax.Array] = None
    down_idx: Optional[jax.Array] = None
    up_idx: Optional[jax.Array] = None


def build_hierarchy(
    st: "SparseTensor",
    num_scales: int,
    capacities,
    kernel_size: int = 3,
    subm_scales: Optional[int] = None,
):
    """Build all site sets and rulebooks for a ``num_scales``-deep UNet.

    Args:
      st: input SparseTensor (stride-1 site set, sorted).
      num_scales: number of scales (>= 1).
      capacities: per-scale row capacities, len == num_scales.
      kernel_size: submanifold kernel (odd).
      subm_scales: build submanifold rulebooks only for scales < this
        (None = all). Scales handled by the dense backbone tail need site
        sets (for gather-back) but no rulebooks — the dominant cost.

    Returns:
      (scales: List[ScaleSet], overflow: int32[B, num_scales-1] dropped
       coarse sites per downsample step).
    """
    assert len(capacities) >= num_scales
    coords, nvalid = st.coords, st.nvalid
    scales: List[ScaleSet] = []
    overflows = []

    # per-scene work unrolled on single chip, vmapped under GSPMD — see
    # ops/batching.py for the measured policy
    from .batching import map_scenes as _map_scenes

    n_subm = num_scales if subm_scales is None else subm_scales
    for s in range(num_scales):
        subm = None
        if s < n_subm:
            subm = _map_scenes(
                lambda c, n: rb.submanifold_rulebook(c, n, kernel_size),
                coords, nvalid,
            )
        if s < num_scales - 1:
            cap_next = capacities[s + 1]
            if s < n_subm:
                # one fused pass: coarse sites + down + up rulebooks from
                # the unique-inverse map (no sort-merge lookups)
                oc, on, ovf, down, up = _map_scenes(
                    lambda c, n: rb.downsample_with_rulebooks(c, n, 2, cap_next),
                    coords, nvalid,
                )
            else:
                # dense-tail scales: site set only, no conv rulebooks
                oc, on, ovf = _map_scenes(
                    lambda c, n: rb.downsample_sites(c, n, 2, cap_next),
                    coords, nvalid,
                )
                down = up = None
            overflows.append(ovf)
            scales.append(
                ScaleSet(coords=coords, nvalid=nvalid, subm_idx=subm,
                         down_idx=down, up_idx=up)
            )
            coords, nvalid = oc, on
        else:
            scales.append(ScaleSet(coords=coords, nvalid=nvalid, subm_idx=subm))
    overflow = (
        jnp.stack(overflows, axis=-1)
        if overflows
        else jnp.zeros((st.batch_size, 0), jnp.int32)
    )
    return scales, overflow
