"""DINOv2 ViT image encoder (flax) for conditioning features.

The reference conditions on `dinov2_vitl14_reg` token features
(trellis/pipelines/trellis_image_to_3d.py:121-146 `encode_image`: forward to
`x_prenorm`, then layernorm; scripts/encode_*_dinov2_feature.py for video
frames). This is a faithful ViT-L/14 + 4 register tokens architecture in
flax; weights convert from the torch hub checkpoint via
utils/weight_convert.torch_vit_to_flax (hub download requires network, so
conversion happens wherever the torch weights are available).

Returns the full token sequence [B, 1 + R + L, C] *pre-norm* plus the
final layernormed version, matching `x_prenorm` semantics.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp


class PatchEmbed(nn.Module):
    patch_size: int = 14
    embed_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] -> [B, H/p * W/p, C]."""
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="proj",
        )(x)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)  # DINOv2 uses exact-erf GELU
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale_init: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..nn.attention import MultiHeadAttention

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = MultiHeadAttention(
            self.dim, self.num_heads, attn_type="self", dtype=self.dtype,
            name="attn",
        )(h)
        ls1 = self.param(
            "ls1_gamma",
            nn.initializers.constant(self.layerscale_init), (self.dim,),
        )
        x = x + h * ls1
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                name="mlp")(h)
        ls2 = self.param(
            "ls2_gamma",
            nn.initializers.constant(self.layerscale_init), (self.dim,),
        )
        return x + h * ls2


class DinoV2(nn.Module):
    """ViT-L/14 with register tokens (dinov2_vitl14_reg defaults)."""

    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    num_register_tokens: int = 4
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_prenorm: bool = True):
        """x: [B, H, W, 3] normalized images -> tokens [B, 1+R+L, C]."""
        B = x.shape[0]
        h = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                       name="patch_embed")(x)
        n_patches = h.shape[1]

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + (self.img_size // self.patch_size) ** 2, self.embed_dim),
        )
        reg = self.param(
            "register_tokens", nn.initializers.zeros,
            (1, self.num_register_tokens, self.embed_dim),
        )

        # interpolate pos embed if resolution differs (bilinear over the grid)
        n_pos = pos.shape[1] - 1
        if n_pos != n_patches:
            g0 = int(n_pos**0.5)
            g1 = int(n_patches**0.5)
            grid = pos[:, 1:].reshape(1, g0, g0, self.embed_dim)
            grid = jax.image.resize(grid, (1, g1, g1, self.embed_dim), "bilinear")
            pos = jnp.concatenate(
                [pos[:, :1], grid.reshape(1, n_patches, self.embed_dim)], axis=1
            )

        h = h + pos[:, 1:]
        cls_t = jnp.broadcast_to(cls + pos[:, :1], (B, 1, self.embed_dim))
        reg_t = jnp.broadcast_to(reg, (B, self.num_register_tokens, self.embed_dim))
        h = jnp.concatenate([cls_t, reg_t, h], axis=1)

        for i in range(self.depth):
            h = Block(
                self.embed_dim, self.num_heads, self.mlp_ratio,
                dtype=self.dtype, name=f"blocks_{i}",
            )(h)

        prenorm = h
        normed = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(h)
        return (prenorm, normed) if return_prenorm else normed


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] in [0,1] -> imagenet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (images - mean) / std


def encode_image(model: DinoV2, params, images: jnp.ndarray) -> jnp.ndarray:
    """Reference encode_image semantics (trellis_image_to_3d.py:121-146):
    forward, take x_prenorm, then layernorm over channels."""
    prenorm, _ = model.apply(params, preprocess(images))
    mu = jnp.mean(prenorm, axis=-1, keepdims=True)
    var = jnp.var(prenorm, axis=-1, keepdims=True)
    return (prenorm - mu) * jax.lax.rsqrt(var + 1e-6)
