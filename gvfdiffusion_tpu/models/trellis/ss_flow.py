"""TRELLIS sparse-structure flow DiT: dense rectified-flow model on the
patchified 16^3 latent grid, cross-attending to DINOv2 image tokens
(reference trellis/models/sparse_structure_flow.py:55-200).

Channels-last: x is [B, R, R, R, C]; patchify folds patch^3 cells into
channels; an APE table over the patch grid is a fixed (parameter-free) bias.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...nn.embedders import AbsolutePositionEmbedder, TimestepEmbedder
from ...nn.transformer import ModulatedCrossBlock


def patchify_3d(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, R, R, R, C] -> [B, (R/p)^3, C*p^3] token grid."""
    b, r, _, _, c = x.shape
    n = r // p
    x = x.reshape(b, n, p, n, p, n, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # [b, n, n, n, p, p, p, c]
    return x.reshape(b, n**3, p**3 * c)


def unpatchify_3d(x: jnp.ndarray, p: int, r: int) -> jnp.ndarray:
    """[B, (R/p)^3, C*p^3] -> [B, R, R, R, C]."""
    b, l, cp = x.shape
    n = r // p
    c = cp // p**3
    x = x.reshape(b, n, n, n, p, p, p, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, r, r, r, c)


class SparseStructureFlowModel(nn.Module):
    resolution: int = 16
    in_channels: int = 8
    model_channels: int = 1024
    cond_channels: int = 1024
    out_channels: int = 8
    num_blocks: int = 24
    num_heads: Optional[int] = 16
    mlp_ratio: float = 4.0
    patch_size: int = 2
    pe_mode: str = "ape"
    share_mod: bool = False
    qk_rms_norm: bool = False
    qk_rms_norm_cross: bool = False
    remat_blocks: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        """x [B, R, R, R, C]; t [B]; cond [B, Lc, cond_channels]."""
        B = x.shape[0]
        C = self.model_channels
        p = self.patch_size
        xavier = nn.initializers.xavier_uniform()

        h = patchify_3d(x, p)
        h = nn.Dense(C, dtype=self.dtype, kernel_init=xavier, name="input_layer")(h)

        if self.pe_mode == "ape":
            n = self.resolution // p
            g = np.arange(n)
            coords = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
            pe = AbsolutePositionEmbedder(C, name="pos_embedder")(
                jnp.asarray(coords, jnp.float32)
            )
            h = h + pe[None].astype(h.dtype)

        t_emb = TimestepEmbedder(C, name="t_embedder")(t)
        mod = t_emb
        if self.share_mod:
            mod = nn.Dense(
                6 * C, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, name="adaLN_modulation",
            )(nn.silu(t_emb))

        RematBlock = nn.remat(ModulatedCrossBlock)
        for i in range(self.num_blocks):
            Block = RematBlock if i < self.remat_blocks else ModulatedCrossBlock
            h = Block(
                channels=C, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                use_rope=(self.pe_mode == "rope"), qk_rms_norm=self.qk_rms_norm,
                qk_rms_norm_cross=self.qk_rms_norm_cross, share_mod=self.share_mod,
                dtype=self.dtype, name=f"blocks_{i}",
            )(h, mod, cond)

        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-5,
                         dtype=jnp.float32, name="out_norm")(h)
        h = nn.Dense(
            self.out_channels * p**3, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="out_layer",
        )(h)
        return unpatchify_3d(h, p, self.resolution)
