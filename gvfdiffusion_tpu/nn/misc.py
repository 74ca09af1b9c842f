"""Misc NN utilities (reference model/nn.py: update_ema :277, Conv4d
:107-177, AttentionPooling, GroupNorm32, zero_module, mean_flat)."""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp


def update_ema(ema_params, params, rate: float = 0.9999):
    """EMA update (reference model/nn.py:277): ema = rate*ema + (1-rate)*p."""
    return jax.tree.map(lambda e, p: e * rate + p * (1.0 - rate), ema_params, params)


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1).mean(axis=1)


class Conv4d(nn.Module):
    """Factorized 4-D convolution: spatial Conv3d over (D,H,W) then temporal
    Conv over T (reference model/nn.py:107-177 decomposes exactly this way —
    a full 4D conv is the composition for separable kernels; factorization is
    the TPU-friendly and parameter-efficient choice the reference also makes).

    Input [B, T, D, H, W, C] -> [B, T, D, H, W, features].
    """

    features: int
    spatial_kernel: int = 3
    temporal_kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, d, h, w, c = x.shape
        k = self.spatial_kernel
        hs = nn.Conv(
            self.features, (k, k, k), padding="SAME", dtype=self.dtype,
            name="spatial_conv",
        )(x.reshape(b * t, d, h, w, c))
        hs = hs.reshape(b, t, d, h, w, self.features)
        # temporal conv over T, batched over all spatial positions
        ht = hs.transpose(0, 2, 3, 4, 1, 5).reshape(b * d * h * w, t, self.features)
        ht = nn.Conv(
            self.features, (self.temporal_kernel,), padding="SAME",
            dtype=self.dtype, name="temporal_conv",
        )(ht)
        ht = ht.reshape(b, d, h, w, t, self.features).transpose(0, 4, 1, 2, 3, 5)
        return ht


class AttentionPooling(nn.Module):
    """Single-query attention pooling over a token set
    (reference model/nn.py AttentionPooling)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, L, C] -> [B, C]."""
        b, l, c = x.shape
        mean = x.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, x], axis=1)
        h_dim = c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(mean)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(tokens)
        q = q.reshape(b, 1, self.num_heads, h_dim)
        k = k.reshape(b, l + 1, self.num_heads, h_dim)
        v = v.reshape(b, l + 1, self.num_heads, h_dim)
        out = jax.nn.dot_product_attention(q, k, v)
        return out.reshape(b, c)
