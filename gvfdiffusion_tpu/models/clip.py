"""CLIP image encoder (flax) — the azimuth-alignment scorer's model.

The reference loads OpenAI CLIP ViT-B/32 for image-image similarity during
alignment (utils/inference_utils.py:48 `clip.load("ViT-B/32")`, scoring at
:105-130). This is the visual tower only (the alignment compares two
images, no text): conv patchify, class token, pre-LN transformer with
QuickGELU MLPs, post-LN, linear projection to the joint space. Weights
convert from the torch checkpoint via utils/weight_convert.convert_clip_visual
(numeric parity tested in tests/test_torch_parity.py).

`make_clip_score_fn` produces the callable `align_gaussian_to_canonical`
accepts: renders [A, H, W, 3] -> cosine similarity to the target frame.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPBlock(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..nn.attention import MultiHeadAttention

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        h = MultiHeadAttention(
            self.dim, self.heads, attn_type="self", dtype=self.dtype,
            name="attn",
        )(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="c_proj")(h)
        return x + h


class CLIPImageEncoder(nn.Module):
    """ViT-B/32 visual tower defaults. Input [B, H, W, 3] in [0, 1]
    (CLIP-normalized internally); output [B, embed_dim] UN-normalized
    embeddings (callers cosine-normalize)."""

    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    depth: int = 12
    heads: int = 12
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(CLIP_MEAN)
        std = jnp.asarray(CLIP_STD)
        x = (images - mean) / std
        if x.shape[1:3] != (self.image_size, self.image_size):
            # OpenAI CLIP preprocessing: BICUBIC resize of the SHORT side to
            # image_size, then center crop — not a full-image stretch (which
            # would distort non-square inputs and drift the embeddings).
            b, h, w, _ = x.shape
            if h <= w:
                rh, rw = self.image_size, max(
                    self.image_size, int(round(w * self.image_size / h)))
            else:
                rw, rh = self.image_size, max(
                    self.image_size, int(round(h * self.image_size / w)))
            x = jax.image.resize(x, (b, rh, rw, 3), "cubic")
            oy = (rh - self.image_size) // 2
            ox = (rw - self.image_size) // 2
            x = x[:, oy:oy + self.image_size, ox:ox + self.image_size, :]
        p = self.patch_size
        h = nn.Conv(self.width, (p, p), strides=(p, p), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        b, gh, gw, c = h.shape
        h = h.reshape(b, gh * gw, c)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)).astype(h.dtype), h], 1
        )
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (1 + gh * gw, self.width))
        h = h + pos[None].astype(h.dtype)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(h)
        for i in range(self.depth):
            h = CLIPBlock(self.width, self.heads, dtype=self.dtype,
                          name=f"resblocks_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(h[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.embed_dim))
        return h @ proj.astype(h.dtype)


def make_clip_score_fn(model: CLIPImageEncoder, params,
                       target_image: np.ndarray) -> Callable:
    """The `clip_score_fn` hook for align_gaussian_to_canonical: embeds the
    target once; returns fn(renders [A, H, W, 3]) -> cosine sims [A]."""
    embed = jax.jit(lambda p, im: model.apply(p, im))

    def norm(e):
        return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-8)

    tgt = norm(embed(params, jnp.asarray(target_image)[None]))[0]

    def score(renders) -> np.ndarray:
        e = norm(embed(params, jnp.asarray(renders)))
        return np.asarray(e @ tgt)

    return score
