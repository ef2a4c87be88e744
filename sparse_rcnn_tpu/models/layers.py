"""Sparse layer modules (flax.linen) over the gather-form executor.

Module-level equivalents of the reference's sparse nn layers (SURVEY.md
C5–C8: SubMConv3d / SparseConv3d / SparseInverseConv3d / sparse BN; tree
empty at survey, §0). Each module holds only parameters; rulebooks come in
as arguments (built once per forward by :mod:`..ops.hierarchy`), so the
same tables are shared across every layer on a site set.

Row masking invariant: padding rows carry zero features in and out of every
layer. Convs preserve this automatically (all their rulebook entries are
-1); BN/activations re-mask explicitly.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import sparse_conv as sc


def _kaiming_init(key, shape, dtype):
    # shape [K, Cin, Cout]: fan_in = K * Cin (dense-conv equivalent)
    fan_in = shape[0] * shape[1]
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class SparseConv(nn.Module):
    """Generic sparse conv: feats [B,M_in,Cin] × idx [B,K,M_out] → [B,M_out,Cout].

    Serves submanifold, strided-downsample and inverse conv alike — the
    rulebook fully determines the geometry (SURVEY.md §3.3 recast).
    """

    features: int
    num_taps: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array, idx: jax.Array, t_idx=None) -> jax.Array:
        cin = feats.shape[-1]
        w = self.param(
            "kernel", _kaiming_init, (self.num_taps, cin, self.features), jnp.float32
        )
        if t_idx is None:
            out = sc.sparse_conv(feats.astype(self.dtype), idx, w.astype(self.dtype))
        else:
            # scatter-free backward via the precomputed transposed rulebook
            out = sc.sparse_conv_t(
                feats.astype(self.dtype), idx, t_idx, w.astype(self.dtype)
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            # bias only on live rows (rows with any rulebook hit)
            live = jnp.any(idx >= 0, axis=1)  # [B, M_out]
            out = out + b.astype(out.dtype) * live[..., None].astype(out.dtype)
        return out


class SubMConv3d(nn.Module):
    """Submanifold conv: output sites == input sites (kernel k, odd)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array, subm_idx: jax.Array) -> jax.Array:
        k3 = self.kernel_size ** 3
        # reversing the centered-offset enumeration negates every offset,
        # which IS the transposed rulebook (rulebook duality)
        t_idx = jnp.flip(subm_idx, axis=1)
        return SparseConv(
            self.features, k3, self.use_bias, self.dtype, name="conv"
        )(feats, subm_idx, t_idx)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over live rows only (padding rows excluded from statistics).

    Reference: per-voxel BN over active rows (SURVEY.md C8). With GSPMD the
    masked sums reduce over the *global* batch, so multi-chip training gets
    cross-replica BN for free (no explicit pmean needed inside jit).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array, mask: jax.Array, train: bool) -> jax.Array:
        c = feats.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if train:
            m = mask[..., None].astype(jnp.float32)
            f32 = feats.astype(jnp.float32)
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(f32 * m, axis=(0, 1)) / count
            var = jnp.sum(jnp.square(f32 - mean) * m, axis=(0, 1)) / count
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        # Statistics above are f32 (fused into the reductions — no f32 copy
        # of the activation is materialized); the NORMALIZE chain runs in
        # the compute dtype. In bf16 models this keeps every elementwise
        # temp bf16 — the f32 normalize chain materialized 512 MB HLO temps
        # per dense-tail BN in the 2cm train step (the r3 OOM dump) and its
        # cast-backward made f32 cotangent copies. Standard mixed-precision
        # BN semantics: f32 stats, compute-dtype application.
        cd = self.dtype
        inv = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(cd)
        out = (feats.astype(cd) - mean.astype(cd)) * inv + bias.astype(cd)
        return out * mask[..., None].astype(cd)


class SparseBasicBlock(nn.Module):
    """Residual block: (BN → ReLU → SubM) × 2 + skip, pre-activation style."""

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, subm_idx, mask, train: bool):
        residual = feats
        x = MaskedBatchNorm(dtype=self.dtype, name="bn1")(feats, mask, train)
        x = nn.relu(x)
        x = SubMConv3d(self.features, self.kernel_size, dtype=self.dtype, name="conv1")(x, subm_idx)
        x = MaskedBatchNorm(dtype=self.dtype, name="bn2")(x, mask, train)
        x = nn.relu(x)
        x = SubMConv3d(self.features, self.kernel_size, dtype=self.dtype, name="conv2")(x, subm_idx)
        if residual.shape[-1] != self.features:
            residual = SubMConv3d(self.features, 1, dtype=self.dtype, name="proj")(
                residual, subm_idx[:, subm_idx.shape[1] // 2 : subm_idx.shape[1] // 2 + 1, :]
            )
        return x + residual


class SparseDropout(nn.Module):
    """Row-masked feature dropout (SURVEY.md C8); inert when not training."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, feats: jax.Array, train: bool) -> jax.Array:
        if self.rate <= 0.0 or not train:
            return feats
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, feats.shape)
        return jnp.where(keep, feats / (1.0 - self.rate), 0.0).astype(feats.dtype)


class MLP(nn.Module):
    """Plain per-row MLP (used by heads)."""

    features: tuple
    dtype: Any = jnp.float32
    final_activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"dense{i}")(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        if self.final_activation is not None:
            x = self.final_activation(x)
        return x
