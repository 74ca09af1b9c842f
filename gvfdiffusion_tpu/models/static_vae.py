"""Static (canonical GS) VAE: sparse transformer encoder/decoder over 64^3
sparse voxels.

Re-design of the reference SparseTransformerVAE
(model/sparse_voxel_diffusion/sparse_transformer_vae.py:14-215) + its block
schedule (sparse_transformer.py:11-25 block_attn_config): swin-windowed
sparse attention with alternating half-window shifts, APE positional
embedding, zero-init to_latent/out_layer, optional output layernorm.
Config mirrors configs/diffusion.yml:41-58 (12 blocks, 768 ch, window 8,
8-ch latent, in 1024 -> out 112 = 8 Gaussians x 14 attrs per voxel).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.embedders import AbsolutePositionEmbedder
from ..sparse.attention import SparseMultiHeadAttention
from ..sparse.ops import SparseLayerNorm, SparseLinear
from ..sparse.tensor import SparseVoxels

# the 4 rotating serialize modes (reference sparse/attention/serialized_attn.py:23)
SERIALIZE_MODES = (
    ("z_order", (0, 1, 2)),
    ("z_order", (2, 0, 1)),
    ("hilbert", (0, 1, 2)),
    ("hilbert", (2, 0, 1)),
)


def block_attn_config(attn_mode: str, window_size: int, num_blocks: int):
    """Per-block attention schedule (reference sparse_transformer.py:11-25).

    Yields (mode, window_size, seq_shift, shift_window, (curve, permute)).
    """
    for i in range(num_blocks):
        if attn_mode == "shift_window":
            yield ("serialized", window_size, 0, (16 * (i % 2),) * 3, SERIALIZE_MODES[0])
        elif attn_mode == "shift_sequence":
            yield ("serialized", window_size, window_size // 2 * (i % 2), (0, 0, 0), SERIALIZE_MODES[0])
        elif attn_mode == "shift_order":
            yield ("serialized", window_size, 0, (0, 0, 0), SERIALIZE_MODES[i % 4])
        elif attn_mode == "full":
            yield ("full", None, 0, (0, 0, 0), SERIALIZE_MODES[0])
        elif attn_mode == "swin":
            yield ("windowed", window_size, 0, (window_size // 2 * (i % 2),) * 3, SERIALIZE_MODES[0])
        else:
            raise ValueError(attn_mode)


class SparseFeedForward(nn.Module):
    hidden_size: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels) -> SparseVoxels:
        h = SparseLinear(int(self.hidden_size * self.mlp_ratio), dtype=self.dtype,
                         name="mlp_0")(x)
        h = h.map_feats(lambda f: nn.gelu(f, approximate=True))
        return SparseLinear(self.hidden_size, dtype=self.dtype, name="mlp_2")(h)


class SparseTransformerBlock(nn.Module):
    """Pre-norm sparse block, optionally adaLN-Zero modulated
    (reference sparse_transformer.py:126-199)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    attn_mode: str = "windowed"
    window_size: Optional[int] = None
    seq_shift: int = 0
    shift_window: Tuple[int, int, int] = (0, 0, 0)
    serialize_curve: str = "z_order"
    serialize_permute: Tuple[int, int, int] = (0, 1, 2)
    modulated: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels, c: Optional[jnp.ndarray] = None) -> SparseVoxels:
        attn = SparseMultiHeadAttention(
            channels=self.hidden_size,
            num_heads=self.num_heads,
            attn_mode=self.attn_mode,
            window_size=self.window_size,
            shift_window=self.shift_window,
            serialize_curve=self.serialize_curve,
            serialize_permute=self.serialize_permute,
            seq_shift=self.seq_shift,
            qkv_bias=True,
            dtype=self.dtype,
            name="attn",
        )
        norm1 = SparseLayerNorm(affine=False, name="norm1")
        norm2 = SparseLayerNorm(affine=False, name="norm2")
        mlp = SparseFeedForward(self.hidden_size, self.mlp_ratio, dtype=self.dtype, name="mlp")

        if self.modulated:
            assert c is not None
            zero = nn.initializers.zeros
            mod = nn.Dense(6 * self.hidden_size, kernel_init=zero, bias_init=zero,
                           dtype=self.dtype, name="adaLN_modulation")(nn.silu(c))
            sh_a, sc_a, g_a, sh_m, sc_m, g_m = jnp.split(mod, 6, axis=-1)
            h = norm1(x)
            h = h.replace_feats(h.feats * (1 + sc_a[:, None]) + sh_a[:, None])
            h = attn(h)
            x = x + h.feats * g_a[:, None]
            h = norm2(x)
            h = h.replace_feats(h.feats * (1 + sc_m[:, None]) + sh_m[:, None])
            h = mlp(h)
            x = x + h.feats * g_m[:, None]
        else:
            x = x + attn(norm1(x)).feats
            x = x + mlp(norm2(x)).feats
        return x


class SparseTransformerVAE(nn.Module):
    """See module docstring. Uses setup() so encode/decode are independently
    callable via apply(method=...)."""

    resolution: int = 64
    in_channels: int = 1024
    model_channels: int = 768
    out_channels: int = 112
    latent_channels: int = 8
    num_blocks: int = 12
    window_size: int = 8
    num_heads: Optional[int] = None
    mlp_ratio: float = 4.0
    attn_mode: str = "swin"
    pe_mode: str = "ape"
    norm_output: bool = True
    remat_blocks: int = 0
    dtype: jnp.dtype = jnp.float32

    @property
    def heads(self) -> int:
        return self.num_heads or self.model_channels // 64

    def setup(self):
        cfgs = list(block_attn_config(self.attn_mode, self.window_size, self.num_blocks))

        def build_blocks(prefix):
            blocks = []
            for i, (mode, ws, seq_shift, shift_w, (curve, perm)) in enumerate(cfgs):
                cls = nn.remat(SparseTransformerBlock) if i < self.remat_blocks else SparseTransformerBlock
                blocks.append(
                    cls(
                        hidden_size=self.model_channels,
                        num_heads=self.heads,
                        mlp_ratio=self.mlp_ratio,
                        attn_mode=mode,
                        window_size=ws,
                        seq_shift=seq_shift,
                        shift_window=shift_w,
                        serialize_curve=curve,
                        serialize_permute=perm,
                        modulated=False,
                        dtype=self.dtype,
                        name=f"{prefix}_{i}",
                    )
                )
            return blocks

        zero = nn.initializers.zeros
        if self.pe_mode == "ape":
            self.pos_embedder = AbsolutePositionEmbedder(self.model_channels)
        self.input_layer = SparseLinear(self.model_channels, dtype=self.dtype)
        self.encoder = build_blocks("enc")
        self.enc_norm = SparseLayerNorm(affine=False) if self.norm_output else None
        self.to_latent = SparseLinear(
            2 * self.latent_channels, kernel_init=zero, bias_init=zero,
        )
        self.from_latent = SparseLinear(self.model_channels, dtype=self.dtype)
        self.decoder = build_blocks("dec")
        self.dec_norm = SparseLayerNorm(affine=False) if self.norm_output else None
        self.out_layer = SparseLinear(self.out_channels, kernel_init=zero, bias_init=zero)

    def _ape(self, x: SparseVoxels) -> jnp.ndarray:
        pe = self.pos_embedder(x.coords.astype(jnp.float32))
        return pe * x.valid[..., None]

    def encode(self, x: SparseVoxels, rng: Optional[jax.Array] = None,
               sample_posterior: bool = False):
        """Returns (z: SparseVoxels, mean, logvar)."""
        h = self.input_layer(x)
        if self.pe_mode == "ape":
            h = h + self._ape(x)
        for block in self.encoder:
            h = block(h)
        if self.enc_norm is not None:
            h = self.enc_norm(h)
        lat = self.to_latent(h)
        mean, logvar = jnp.split(lat.feats, 2, axis=-1)
        if sample_posterior:
            assert rng is not None
            std = jnp.exp(0.5 * logvar)
            zf = mean + std * jax.random.normal(rng, std.shape)
        else:
            zf = mean
        z = x.replace(feats=zf * x.valid[..., None])
        return z, mean, logvar

    def decode(self, latent: SparseVoxels) -> SparseVoxels:
        h = self.from_latent(latent)
        if self.pe_mode == "ape":
            h = h + self._ape(latent)
        for block in self.decoder:
            h = block(h)
        if self.dec_norm is not None:
            h = self.dec_norm(h)
        return self.out_layer(h)

    def __call__(self, x: SparseVoxels, rng: Optional[jax.Array] = None,
                 sample_posterior: bool = True):
        z, mean, logvar = self.encode(x, rng, sample_posterior)
        out = self.decode(z)
        return out, mean, logvar
