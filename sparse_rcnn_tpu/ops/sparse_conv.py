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

    out = jax.vmap(per_scene)(feats, idx)
    return out.astype(out_dtype)


# Above this many im2col columns (K*Cin), the concatenated buffer costs more
# HBM traffic than the per-tap matmuls recover in MXU utilization.
_CONCAT_MAX_COLS = 4096


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

    out = jax.vmap(per_scene)(feats, idx)
    return out.astype(out_dtype)


# Executor selection: "auto" picks im2col vs scan by K*Cin; "pallas" uses
# the fused tap-accumulate kernel (ops.pallas_conv) for the matmul stage.
_EXECUTOR_MODE = "auto"


def set_executor_mode(mode: str) -> None:
    """Select the conv executor globally: auto | concat | scan | pallas.

    Takes effect at trace time (call before jit-compiling steps).
    """
    global _EXECUTOR_MODE
    assert mode in ("auto", "concat", "scan", "pallas"), mode
    _EXECUTOR_MODE = mode


def _best_executor(k: int, cin: int):
    if _EXECUTOR_MODE == "scan":
        return gather_matmul_conv
    if _EXECUTOR_MODE == "concat":
        return concat_matmul_conv
    if _EXECUTOR_MODE == "pallas":
        from . import pallas_conv

        return pallas_conv.pallas_conv
    return concat_matmul_conv if k * cin <= _CONCAT_MAX_COLS else gather_matmul_conv


@jax.custom_vjp
def sparse_conv(feats: jax.Array, idx: jax.Array, weights: jax.Array) -> jax.Array:
    """Sparse conv with gather-form (scatter-free) backward. Default executor.

    Picks the im2col executor for small K*Cin (MXU utilization), the
    scan-over-taps executor otherwise (HBM traffic).
    """
    return _best_executor(weights.shape[0], weights.shape[1])(feats, idx, weights)


def _fwd(feats, idx, weights):
    return sparse_conv(feats, idx, weights), (feats, idx, weights)


def _bwd(res, g):
    feats, idx, weights = res
    k, cin, cout = weights.shape
    m_in = feats.shape[1]
    g = g.astype(jnp.float32)

    # d_W[k] = sum_b gathered_bk^T @ g_b.
    if k * cin <= _CONCAT_MAX_COLS:
        def dw_scene(f, ix, gb):
            m_out = ix.shape[1]
            safe = jnp.clip(ix, 0, f.shape[0] - 1)
            gath = f[safe] * (ix >= 0)[..., None].astype(f.dtype)   # [K, M, Cin]
            gath = jnp.swapaxes(gath, 0, 1).reshape(m_out, k * cin)
            return jnp.dot(
                gath.T.astype(jnp.float32), gb,
                preferred_element_type=jnp.float32,
            ).reshape(k, cin, cout)
    else:
        def dw_scene(f, ix, gb):
            def step(_, ix_k):
                return None, _gather_rows(f, ix_k).astype(jnp.float32)
            _, gathered = lax.scan(step, None, ix)  # [K, M_out, Cin]
            return jnp.einsum(
                "kmc,md->kcd", gathered, gb, preferred_element_type=jnp.float32
            )

    d_w = jax.vmap(dw_scene)(feats, idx, g).sum(axis=0)

    # d_feats via transposed rulebook: pure gather, no scatter.
    t_idx = jax.vmap(lambda ix: rb.transpose_rulebook(ix, m_in))(idx)
    w_t = jnp.swapaxes(weights, -1, -2).astype(jnp.float32)  # [K, Cout, Cin]
    d_f = _best_executor(k, cout)(g, t_idx, w_t)
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
    return _best_executor(weights.shape[0], weights.shape[1])(feats, idx, weights)


def _fwd_t(feats, idx, t_idx, weights):
    return sparse_conv_t(feats, idx, t_idx, weights), (feats, idx, t_idx, weights)


def _bwd_t(res, g):
    feats, idx, t_idx, weights = res
    k, cin, cout = weights.shape
    g = g.astype(jnp.float32)

    if k * cin <= _CONCAT_MAX_COLS:
        def dw_scene(f, ix, gb):
            m_out = ix.shape[1]
            safe = jnp.clip(ix, 0, f.shape[0] - 1)
            gath = f[safe] * (ix >= 0)[..., None].astype(f.dtype)
            gath = jnp.swapaxes(gath, 0, 1).reshape(m_out, k * cin)
            return jnp.dot(
                gath.T.astype(jnp.float32), gb,
                preferred_element_type=jnp.float32,
            ).reshape(k, cin, cout)
    else:
        def dw_scene(f, ix, gb):
            def step(_, ix_k):
                return None, _gather_rows(f, ix_k).astype(jnp.float32)
            _, gathered = lax.scan(step, None, ix)
            return jnp.einsum(
                "kmc,md->kcd", gathered, gb, preferred_element_type=jnp.float32
            )

    d_w = jax.vmap(dw_scene)(feats, idx, g).sum(axis=0)
    w_t = jnp.swapaxes(weights, -1, -2).astype(jnp.float32)
    d_f = _best_executor(k, cout)(g, t_idx, w_t)
    return d_f.astype(feats.dtype), None, None, d_w.astype(weights.dtype)


sparse_conv_t.defvjp(_fwd_t, _bwd_t)
