"""Embedding modules (reference: model/dit.py:16-125, model/nn.py:timestep_embedding).

Ordering conventions match the reference exactly for checkpoint parity:
timestep embeddings concatenate [cos, sin]; absolute position embeddings
concatenate [sin, cos].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [cos|sin] order (reference model/dit.py:73-96).

    t: [B] possibly-fractional timesteps -> [B, dim].
    """
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    """Sinusoidal frequencies -> 2-layer SiLU MLP (reference model/dit.py:59-101)."""

    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(
            self.hidden_size,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.02),
            name="mlp_0",
        )(x)
        x = nn.silu(x)
        x = nn.Dense(
            self.hidden_size,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.02),
            name="mlp_2",
        )(x)
        return x


# The reference's CanonicalFrameEmbedder (model/dit.py:103-125) is structurally
# identical to TimestepEmbedder; reuse the same module.
CanonicalFrameEmbedder = TimestepEmbedder


class AbsolutePositionEmbedder(nn.Module):
    """Sinusoidal embedding of D-dim positions, [sin|cos] per axis, zero-padded
    to `channels` (reference model/dit.py:16-56). Parameter-free."""

    channels: int
    in_channels: int = 3

    @nn.compact
    def __call__(self, pos: jnp.ndarray) -> jnp.ndarray:
        """pos: [..., in_channels] float positions -> [..., channels]."""
        freq_dim = self.channels // self.in_channels // 2
        freqs = 1.0 / (
            10000.0 ** (jnp.arange(freq_dim, dtype=jnp.float32) / freq_dim)
        )
        args = pos.astype(jnp.float32)[..., None] * freqs  # [..., D, freq_dim]
        emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
        emb = emb.reshape(*pos.shape[:-1], -1)  # [..., D * 2*freq_dim]
        pad = self.channels - emb.shape[-1]
        if pad > 0:
            emb = jnp.concatenate(
                [emb, jnp.zeros(emb.shape[:-1] + (pad,), emb.dtype)], axis=-1
            )
        return emb
