"""TRELLIS sparse-structure VAE: dense 3-D conv VAE, 64^3 occupancy <-> 16^3x8
latent (reference trellis/models/sparse_structure_vae.py:101-306).

Channels-last NDHWC layout (XLA-native conv layout on TPU); pixel-shuffle-3d
upsampling; layer-norm over channels; fp32 norms.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def pixel_shuffle_3d(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """[B, D, H, W, C*f^3] -> [B, D*f, H*f, W*f, C]."""
    b, d, h, w, c = x.shape
    f = factor
    c_out = c // (f**3)
    x = x.reshape(b, d, h, w, f, f, f, c_out)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d * f, h * f, w * f, c_out)


def _norm(norm_type: str, name: str):
    if norm_type == "layer":
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
    if norm_type == "group":
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name=name)
    raise ValueError(norm_type)


class ResBlock3d(nn.Module):
    channels: int
    out_channels: Optional[int] = None
    norm_type: str = "layer"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.out_channels or self.channels
        h = _norm(self.norm_type, "norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3, 3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = _norm(self.norm_type, "norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(
            out_ch, (3, 3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="conv2",
        )(h)
        skip = x
        if out_ch != self.channels:
            skip = nn.Conv(out_ch, (1, 1, 1), dtype=self.dtype, name="skip_connection")(x)
        return h + skip


class DownsampleBlock3d(nn.Module):
    out_channels: int
    mode: str = "conv"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.mode == "conv":
            return nn.Conv(
                self.out_channels, (2, 2, 2), strides=(2, 2, 2),
                dtype=self.dtype, name="conv",
            )(x)
        return nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))


class UpsampleBlock3d(nn.Module):
    out_channels: int
    mode: str = "conv"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.mode == "conv":
            h = nn.Conv(
                self.out_channels * 8, (3, 3, 3), padding="SAME",
                dtype=self.dtype, name="conv",
            )(x)
            return pixel_shuffle_3d(h, 2)
        b, d, h_, w, c = x.shape
        return jax.image.resize(x, (b, d * 2, h_ * 2, w * 2, c), "nearest")


class SparseStructureEncoder(nn.Module):
    """64^3 occupancy [B,R,R,R,Cin] -> latent mean/logvar [B,r,r,r,Cl]."""

    in_channels: int = 1
    latent_channels: int = 8
    num_res_blocks: int = 2
    channels: Sequence[int] = (32, 128, 512)
    num_res_blocks_middle: int = 2
    norm_type: str = "layer"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rng: Optional[jax.Array] = None, sample_posterior=False):
        h = nn.Conv(self.channels[0], (3, 3, 3), padding="SAME", name="input_layer")(x)
        for i, ch in enumerate(self.channels):
            for j in range(self.num_res_blocks):
                h = ResBlock3d(ch, ch, self.norm_type, self.dtype, name=f"block_{i}_{j}")(h)
            if i < len(self.channels) - 1:
                h = DownsampleBlock3d(self.channels[i + 1], dtype=self.dtype,
                                      name=f"down_{i}")(h)
        for j in range(self.num_res_blocks_middle):
            h = ResBlock3d(self.channels[-1], norm_type=self.norm_type,
                           dtype=self.dtype, name=f"middle_{j}")(h)
        h = _norm(self.norm_type, "out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.latent_channels * 2, (3, 3, 3), padding="SAME",
                    name="out_layer")(h)
        mean, logvar = jnp.split(h, 2, axis=-1)
        if sample_posterior:
            std = jnp.exp(0.5 * logvar)
            z = mean + std * jax.random.normal(rng, std.shape)
        else:
            z = mean
        return z, mean, logvar


class SparseStructureDecoder(nn.Module):
    """latent [B,r,r,r,Cl] -> occupancy logits [B,R,R,R,Cout]."""

    out_channels: int = 1
    latent_channels: int = 8
    num_res_blocks: int = 2
    channels: Sequence[int] = (512, 128, 32)
    num_res_blocks_middle: int = 2
    norm_type: str = "layer"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels[0], (3, 3, 3), padding="SAME", name="input_layer")(x)
        for j in range(self.num_res_blocks_middle):
            h = ResBlock3d(self.channels[0], norm_type=self.norm_type,
                           dtype=self.dtype, name=f"middle_{j}")(h)
        for i, ch in enumerate(self.channels):
            for j in range(self.num_res_blocks):
                h = ResBlock3d(ch, ch, self.norm_type, self.dtype, name=f"block_{i}_{j}")(h)
            if i < len(self.channels) - 1:
                h = UpsampleBlock3d(self.channels[i + 1], dtype=self.dtype,
                                    name=f"up_{i}")(h)
        h = _norm(self.norm_type, "out_norm")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3, 3), padding="SAME", name="out_layer")(h)
