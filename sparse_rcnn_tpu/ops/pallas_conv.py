"""Pallas TPU kernel: fused per-tap matmul-accumulate for sparse conv.

BASELINE north-star: "Pallas blocked gather → MXU matmul → scatter kernels
over a fixed-capacity voxel table". Design study on this stack (jax 0.9 /
Mosaic via remote compile) found in-kernel *gathers* unsupported or
pathological — value-level fancy indexing fails to lower, per-row
``fori_loop`` copies are ~20 cycles/row (orders slower than the matmul) —
so the blocked gather stays in XLA and this kernel fuses everything after:

    out[m_tile] = Σ_k gathered[k, m_tile] @ W[k]   (+ masked epilogue)

with the accumulator held in VMEM across the K taps. Compared to the XLA
im2col path (gather-write → transpose/reshape → one big GEMM) this reads
the gathered tensor once and never materializes the [M, K·Cin] buffer:
~2× less HBM traffic per conv layer.

The pure-XLA executors in :mod:`.sparse_conv` remain the parity oracles
(tests/parity); this kernel is opt-in via ``set_executor_mode("pallas")``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(g_ref, w_ref, out_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        g_ref[0], w_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_m"))
def tap_accumulate_matmul(
    gathered: jax.Array,
    weights: jax.Array,
    interpret: bool = False,
    tile_m: int = 512,
) -> jax.Array:
    """out [M, Cout] = Σ_k gathered[k] @ weights[k].

    gathered [K, M, Cin] (rows already gathered + zero-masked by the
    caller), weights [K, Cin, Cout]. M must be a multiple of ``tile_m``
    (capacities are powers of two ≥ 512 in practice; callers pad).
    """
    k, m, cin = gathered.shape
    cout = weights.shape[-1]
    # Pick the largest power-of-two tile that divides m (capacities are
    # multiples of 128 but not always of 512 — config.scale_capacities());
    # if m is not even tileable by 8, pad rows up to the next multiple.
    m_pad = -(-m // 8) * 8
    if m_pad != m:
        gathered = jnp.pad(gathered, ((0, 0), (0, m_pad - m), (0, 0)))
    tile = 8
    while tile * 2 <= min(tile_m, m_pad) and m_pad % (tile * 2) == 0:
        tile *= 2
    tile_m, m_full = tile, m
    m = m_pad
    out_dtype = jnp.promote_types(gathered.dtype, weights.dtype)

    grid = (m // tile_m, k)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_m, cin), lambda i, kk: (kk, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin, cout), lambda i, kk: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, cout), lambda i, kk: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, cout), out_dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * m * cin * cout,
            bytes_accessed=gathered.size * gathered.dtype.itemsize
            + weights.size * weights.dtype.itemsize
            + m * cout * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(gathered, weights)[:m_full]


def pallas_conv(
    feats: jax.Array, idx: jax.Array, weights: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Batched sparse conv executor: XLA gather + Pallas fused accumulate.

    Same contract as :func:`sparse_rcnn_tpu.ops.sparse_conv.gather_matmul_conv`:
    feats [B, M_in, Cin], idx [B, K, M_out], weights [K, Cin, Cout].
    """
    def per_scene(f, ix):
        safe = jnp.clip(ix, 0, f.shape[0] - 1)
        g = f[safe] * (ix >= 0)[..., None].astype(f.dtype)   # [K, M_out, Cin]
        return tap_accumulate_matmul(g, weights.astype(f.dtype),
                                     interpret=interpret)

    from .batching import map_scenes

    return map_scenes(per_scene, feats, idx)
