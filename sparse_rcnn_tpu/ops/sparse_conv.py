"""Sparse convolution executor: per-offset gather → MXU matmul → accumulate.

The reference executes sparse conv as native gather-GEMM-scatter with a
custom autograd backward (SURVEY.md C4/N3; reference tree empty at survey,
§0). TPU-native recast (BASELINE north-star): with the dense gather-form
rulebook (``neighbor_idx[K, M_out]``, see :mod:`.rulebook`) the forward pass
needs **no scatter at all** — for each kernel tap ``k``:

    out += (feats[idx[k]] masked) @ W[k]

which is exactly a blocked gather feeding the 128x128 MXU. The backward
pass reuses the *transposed* rulebook so grads w.r.t. the input features are
also pure gathers (scatter-free, deterministic):

    d_feats[j] = sum_k g[t_idx[k, j]] @ W[k]^T
    d_W[k]     = (feats[idx[k]] masked)^T @ g

Two implementations:
  * :func:`gather_matmul_conv` — straight-line XLA (lax.scan over taps);
    differentiable by autodiff (scatter-add backward). The parity oracle.
  * :func:`sparse_conv` — custom-VJP wrapper whose backward is the
    gather-form above (SURVEY.md §7 invariant 4). The default.

A fused Pallas kernel lives in :mod:`.pallas_conv`; both must stay
numerically interchangeable (tests/parity).

Shapes: feats [B, M_in, Cin], idx int32[B, K, M_out], weights [K, Cin, Cout]
→ out [B, M_out, Cout]. Accumulation is float32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from . import rulebook as rb


def _gather_rows(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """feats [M, C], idx int32[N] (-1 = missing) → [N, C] with zeros for -1."""
    safe = jnp.clip(idx, 0, feats.shape[0] - 1)
    g = feats[safe]
    return g * (idx >= 0)[:, None].astype(g.dtype)


from .batching import map_scenes as _unroll_scenes  # noqa: E402 (policy: ops/batching.py)


def gather_matmul_conv(
    feats: jax.Array, idx: jax.Array, weights: jax.Array
) -> jax.Array:
    """Reference XLA executor (autodiff-able end to end): scan over taps."""
    out_dtype = jnp.promote_types(feats.dtype, weights.dtype)

    def per_scene(f, ix):
        m_out = ix.shape[1]
        init = jnp.zeros((m_out, weights.shape[-1]), jnp.float32)

        def step(acc, kw):
            ix_k, w_k = kw
            g = _gather_rows(f, ix_k)
            return acc + jnp.dot(g, w_k, preferred_element_type=jnp.float32), None

        acc, _ = lax.scan(step, init, (ix, weights))
        return acc

    out = _unroll_scenes(per_scene, feats, idx)
    return out.astype(out_dtype)


# The im2col executor materializes a [M_out, K*Cin] buffer per scene. Gate
# on BYTES, not columns: at config-2 scale (M=262144, K*Cin=864, f32) the
# buffer is ~906 MB/layer — it must fall back to the blocked executor, which
# processes row tiles under lax.map and never exceeds _BLOCK_ROWS rows.
_IM2COL_MAX_BYTES = 96 * 1024 * 1024
_BLOCK_ROWS = 8192


def _im2col_bytes(m_out: int, k: int, cin: int, dtype) -> int:
    return m_out * k * cin * jnp.dtype(dtype).itemsize


def concat_matmul_conv(
    feats: jax.Array, idx: jax.Array, weights: jax.Array
) -> jax.Array:
    """Im2col executor: ONE MXU matmul per layer instead of K small ones.

    Gathers all taps into G [B, M_out, K*Cin] and contracts with
    W.reshape(K*Cin, Cout). For the small channel counts of sparse UNets
    (Cin 16–96) the per-tap matmuls use a sliver of the 128x128 MXU; the
    concatenated contraction saturates it. Numerics match
    :func:`gather_matmul_conv` up to f32 summation order.
    """
    out_dtype = jnp.promote_types(feats.dtype, weights.dtype)
    k, cin, cout = weights.shape

    def per_scene(f, ix):
        m_out = ix.shape[1]
        safe = jnp.clip(ix, 0, f.shape[0] - 1)          # [K, M_out]
        g = f[safe]                                      # [K, M_out, Cin]
        g = g * (ix >= 0)[..., None].astype(g.dtype)
        g = jnp.swapaxes(g, 0, 1).reshape(m_out, k * cin)
        return jnp.dot(
            g, weights.reshape(k * cin, cout).astype(g.dtype),
            preferred_element_type=jnp.float32,
        )

    out = _unroll_scenes(per_scene, feats, idx)
    return out.astype(out_dtype)


def blocked_matmul_conv(
    feats: jax.Array, idx: jax.Array, weights: jax.Array,
    use_pallas: bool = False, block: int = 0,
) -> jax.Array:
    """Row-blocked im2col: bounded memory at any M_out (the 2cm-scale path).

    Processes M_out in tiles of ``block`` rows under ``lax.map``; each tile
    gathers [K, block, Cin] and contracts it on the MXU — so peak transient
    memory is O(block·K·Cin) instead of O(M_out·K·Cin). With ``use_pallas``
    the contraction is the fused tap-accumulate kernel
    (:func:`.pallas_conv.tap_accumulate_matmul`), which also skips the
    [block, K·Cin] transpose the XLA im2col needs.
    """
    out_dtype = jnp.promote_types(feats.dtype, weights.dtype)
    k, cin, cout = weights.shape
    block = block or _BLOCK_ROWS
    if use_pallas:
        from . import pallas_conv as pc

        interpret = jax.default_backend() != "tpu"

    def per_scene(f, ix):
        m_out = ix.shape[1]
        b = min(block, m_out)
        nt = -(-m_out // b)
        pad = nt * b - m_out
        ixp = jnp.pad(ix, ((0, 0), (0, pad)), constant_values=-1)
        tiles = jnp.swapaxes(ixp.reshape(k, nt, b), 0, 1)   # [nt, K, b]
        w = weights.astype(f.dtype)

        def tile_fn(ix_t):
            safe = jnp.clip(ix_t, 0, f.shape[0] - 1)
            g = f[safe] * (ix_t >= 0)[..., None].astype(f.dtype)  # [K, b, Cin]
            if use_pallas:
                return pc.tap_accumulate_matmul(g, w, interpret=interpret)
            g2 = jnp.swapaxes(g, 0, 1).reshape(b, k * cin)
            return jnp.dot(
                g2, w.reshape(k * cin, cout),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)

        out = lax.map(tile_fn, tiles)                        # [nt, b, Cout]
        return out.reshape(nt * b, cout)[:m_out]

    return _unroll_scenes(per_scene, feats, idx).astype(out_dtype)


# Executor selection: "auto" picks im2col for small gather buffers and the
# row-blocked executor above the byte budget (Pallas contraction on TPU);
# "pallas" forces the Pallas tap-accumulate contraction at any size.
_EXECUTOR_MODE = "auto"


def set_executor_mode(mode: str) -> None:
    """Select the conv executor globally: auto | concat | scan | pallas | blocked.

    Takes effect at trace time (call before jit-compiling steps).
    """
    global _EXECUTOR_MODE
    assert mode in ("auto", "concat", "scan", "pallas", "blocked"), mode
    _EXECUTOR_MODE = mode


def _best_executor(k: int, cin: int, m_out: int, dtype):
    if _EXECUTOR_MODE == "scan":
        return gather_matmul_conv
    if _EXECUTOR_MODE == "concat":
        return concat_matmul_conv
    if _EXECUTOR_MODE == "blocked":
        return blocked_matmul_conv
    if _EXECUTOR_MODE == "pallas":
        import functools

        return functools.partial(blocked_matmul_conv, use_pallas=True)
    if _im2col_bytes(m_out, k, cin, dtype) <= _IM2COL_MAX_BYTES:
        return concat_matmul_conv
    return blocked_matmul_conv


def _pick(feats, idx, weights):
    return _best_executor(
        weights.shape[0], weights.shape[1], idx.shape[-1], feats.dtype
    )


def _conv_dw(feats, idx, g, weights):
    """d_W[k] = Σ_b gathered_bk^T @ g_b — im2col when the gather buffer fits
    the byte budget, row-blocked lax.scan accumulation otherwise."""
    k, cin, cout = weights.shape
    m_out = idx.shape[-1]

    if _im2col_bytes(m_out, k, cin, feats.dtype) <= _IM2COL_MAX_BYTES:
        def dw_scene(f, ix, gb):
            safe = jnp.clip(ix, 0, f.shape[0] - 1)
            gath = f[safe] * (ix >= 0)[..., None].astype(f.dtype)   # [K, M, Cin]
            gath = jnp.swapaxes(gath, 0, 1).reshape(m_out, k * cin)
            return jnp.dot(
                gath.T.astype(jnp.float32), gb,
                preferred_element_type=jnp.float32,
            ).reshape(k, cin, cout)
    else:
        def dw_scene(f, ix, gb):
            b = min(_BLOCK_ROWS, m_out)
            nt = -(-m_out // b)
            pad = nt * b - m_out
            ixp = jnp.pad(ix, ((0, 0), (0, pad)), constant_values=-1)
            gp = jnp.pad(gb, ((0, pad), (0, 0)))
            tiles_ix = jnp.swapaxes(ixp.reshape(k, nt, b), 0, 1)  # [nt, K, b]
            tiles_g = gp.reshape(nt, b, cout)

            def step(acc, t):
                ix_t, g_t = t
                safe = jnp.clip(ix_t, 0, f.shape[0] - 1)
                gath = f[safe] * (ix_t >= 0)[..., None].astype(f.dtype)
                # contraction over the b=block rows — full MXU depth
                return acc + jnp.einsum(
                    "kbc,bd->kcd", gath.astype(jnp.float32), g_t,
                    preferred_element_type=jnp.float32,
                ), None

            acc, _ = lax.scan(
                step, jnp.zeros((k, cin, cout), jnp.float32),
                (tiles_ix, tiles_g),
            )
            return acc

    return _unroll_scenes(dw_scene, feats, idx, g).sum(axis=0)


@jax.custom_vjp
def sparse_conv(feats: jax.Array, idx: jax.Array, weights: jax.Array) -> jax.Array:
    """Sparse conv with gather-form (scatter-free) backward. Default executor.

    Picks the im2col executor when the gather buffer fits the byte budget,
    the row-blocked executor otherwise.
    """
    return _pick(feats, idx, weights)(feats, idx, weights)


def _fwd(feats, idx, weights):
    return sparse_conv(feats, idx, weights), (feats, idx, weights)


def _bwd(res, g):
    feats, idx, weights = res
    m_in = feats.shape[1]
    g = g.astype(jnp.float32)
    d_w = _conv_dw(feats, idx, g, weights)
    # d_feats via transposed rulebook: pure gather, no scatter.
    t_idx = _unroll_scenes(lambda ix: rb.transpose_rulebook(ix, m_in), idx)
    w_t = jnp.swapaxes(weights, -1, -2).astype(jnp.float32)  # [K, Cout, Cin]
    d_f = _pick(g, t_idx, w_t)(g, t_idx, w_t)
    return d_f.astype(feats.dtype), None, d_w.astype(weights.dtype)


sparse_conv.defvjp(_fwd, _bwd)


@jax.custom_vjp
def sparse_conv_t(
    feats: jax.Array, idx: jax.Array, t_idx: jax.Array, weights: jax.Array
) -> jax.Array:
    """Sparse conv with a caller-supplied transposed rulebook.

    The transposes come for free from rulebook dualities — no scatters in
    the backward at all:
      * submanifold (odd centered kernel): t(idx) == idx[:, ::-1, :]
        (reversing the offset enumeration negates every offset),
      * strided down (k==s):               t(down_idx) == up_idx,
      * inverse up (k==s):                 t(up_idx) == down_idx.
    """
    return _pick(feats, idx, weights)(feats, idx, weights)


def _fwd_t(feats, idx, t_idx, weights):
    return sparse_conv_t(feats, idx, t_idx, weights), (feats, idx, t_idx, weights)


def _bwd_t(res, g):
    feats, idx, t_idx, weights = res
    g = g.astype(jnp.float32)
    d_w = _conv_dw(feats, idx, g, weights)
    w_t = jnp.swapaxes(weights, -1, -2).astype(jnp.float32)
    d_f = _pick(g, t_idx, w_t)(g, t_idx, w_t)
    return d_f.astype(feats.dtype), None, None, d_w.astype(weights.dtype)


sparse_conv_t.defvjp(_fwd_t, _bwd_t)
