"""SLat -> radiance-field (Strivec) decoder.

Capability re-design of trellis/models/structured_latent_vae/decoder_rf.py:11
(SLatRadianceFieldDecoder): sparse transformer torso predicting per-voxel
CP-decomposed trivec features that assemble into a Strivec octree
(representations/octree.py), rendered by render/volume_renderer.py.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...representations.octree import Strivec, from_sparse_voxels
from ...sparse.ops import SparseLayerNorm, SparseLinear
from ...sparse.tensor import SparseVoxels
from .slat_decoders import SparseTransformerBase


class SLatRadianceFieldDecoder(nn.Module):
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
    rank: int = 8
    dim: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels) -> Strivec:
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
        out_ch = self.rank * (3 * self.dim + 1 + 3)  # trivec + density + color
        out = SparseLinear(
            out_ch, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="out_layer",
        )(h)
        b, l, _ = out.feats.shape
        assert b == 1, "Strivec assembly is per-sample (batch via vmap/host loop)"
        f = out.feats[0]
        o = 0

        def take(n, shape):
            nonlocal o
            v = f[:, o : o + n].reshape(l, *shape)
            o += n
            return v

        trivec = jnp.exp(take(self.rank * 3 * self.dim, (self.rank, 3, self.dim)))
        density = take(self.rank, (self.rank,))
        colors = jnp.clip(take(self.rank * 3, (self.rank, 3)) + 0.5, 0.0, 1.0)
        tree = from_sparse_voxels(x)
        return Strivec(tree=tree, trivec=trivec, density=density, colors=colors)
