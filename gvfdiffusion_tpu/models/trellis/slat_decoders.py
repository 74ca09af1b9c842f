"""TRELLIS structured-latent VAE: encoder + Gaussian decoder.

Re-design of trellis/models/structured_latent_vae/{base.py:27, decoder_gs.py:11,
encoder.py:9}: a swin sparse-transformer torso (shared block schedule with the
static VAE, models/static_vae.py) plus the 8-Gaussians-per-voxel output layout
shared with the SparseVAE framework (models/sparse_vae.py to_representation).

The GVF checkpoint surgery special-case (reference trellis/models/__init__.py:
46-76 remaps static-VAE `decoder.->blocks.`, `from_latent.->input_layer.`
weights into SLatGaussianDecoder) becomes a plain name-map in the weight
converter (utils/weight_convert.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.embedders import AbsolutePositionEmbedder
from ...sparse.ops import SparseLayerNorm, SparseLinear
from ...sparse.tensor import SparseVoxels
from ..sparse_vae import GSConfig, to_representation
from ..static_vae import SparseTransformerBlock, block_attn_config


class SparseTransformerBase(nn.Module):
    """Input proj + APE + N scheduled sparse blocks (no output layer)."""

    in_channels: int
    model_channels: int
    num_blocks: int
    num_heads: Optional[int] = None
    mlp_ratio: float = 4.0
    attn_mode: str = "swin"
    window_size: Optional[int] = 8
    pe_mode: str = "ape"
    qk_rms_norm: bool = False
    remat_blocks: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels) -> SparseVoxels:
        heads = self.num_heads or self.model_channels // 64
        h = SparseLinear(self.model_channels, dtype=self.dtype, name="input_layer")(x)
        if self.pe_mode == "ape":
            pe = AbsolutePositionEmbedder(self.model_channels, name="pos_embedder")(
                x.coords.astype(jnp.float32)
            )
            h = h + pe * x.valid[..., None]
        cfgs = list(block_attn_config(self.attn_mode, self.window_size or 8, self.num_blocks))
        for i, (mode, ws, seq_shift, shift_w, (curve, perm)) in enumerate(cfgs):
            cls = nn.remat(SparseTransformerBlock) if i < self.remat_blocks else SparseTransformerBlock
            h = cls(
                hidden_size=self.model_channels,
                num_heads=heads,
                mlp_ratio=self.mlp_ratio,
                attn_mode=mode,
                window_size=ws,
                seq_shift=seq_shift,
                shift_window=shift_w,
                serialize_curve=curve,
                serialize_permute=perm,
                modulated=False,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(h)
        return h


class SLatGaussianDecoder(nn.Module):
    """SLat -> per-voxel 8 Gaussians (reference decoder_gs.py:11-130)."""

    resolution: int = 64
    model_channels: int = 768
    latent_channels: int = 8
    num_blocks: int = 12
    num_heads: Optional[int] = None
    mlp_ratio: float = 4.0
    attn_mode: str = "swin"
    window_size: int = 8
    pe_mode: str = "ape"
    qk_rms_norm: bool = False
    rep_config: GSConfig = GSConfig(
        num_gaussians=8, voxel_size=1.5, scaling_bias=0.004, opacity_bias=0.1,
        scaling_activation="softplus", filter_3d_kernel_size=9e-4,
    )
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels):
        """Returns (GaussianSplat [B, L*G], valid [B, L*G])."""
        h = SparseTransformerBase(
            in_channels=self.latent_channels,
            model_channels=self.model_channels,
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            attn_mode=self.attn_mode,
            window_size=self.window_size,
            pe_mode=self.pe_mode,
            qk_rms_norm=self.qk_rms_norm,
            dtype=self.dtype,
            name="torso",
        )(x)
        h = SparseLayerNorm(affine=False, name="out_norm")(h)
        h = SparseLinear(
            self.rep_config.out_channels, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="out_layer",
        )(h)
        return to_representation(h, self.rep_config, self.resolution)


class SLatEncoder(nn.Module):
    """Voxel features -> SLat posterior (reference encoder.py:9)."""

    resolution: int = 64
    in_channels: int = 1024
    model_channels: int = 768
    latent_channels: int = 8
    num_blocks: int = 12
    num_heads: Optional[int] = None
    mlp_ratio: float = 4.0
    attn_mode: str = "swin"
    window_size: int = 8
    pe_mode: str = "ape"
    qk_rms_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels, rng: Optional[jax.Array] = None,
                 sample_posterior: bool = False):
        h = SparseTransformerBase(
            in_channels=self.in_channels,
            model_channels=self.model_channels,
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            attn_mode=self.attn_mode,
            window_size=self.window_size,
            pe_mode=self.pe_mode,
            qk_rms_norm=self.qk_rms_norm,
            dtype=self.dtype,
            name="torso",
        )(x)
        h = SparseLayerNorm(affine=False, name="out_norm")(h)
        h = SparseLinear(2 * self.latent_channels, name="out_layer")(h)
        mean, logvar = jnp.split(h.feats, 2, axis=-1)
        if sample_posterior:
            std = jnp.exp(0.5 * logvar)
            z = mean + std * jax.random.normal(rng, std.shape)
        else:
            z = mean
        return x.replace(feats=z * x.valid[..., None]), mean, logvar
