"""Transformer building blocks: FFN, adaLN-modulated spatio-temporal cross
block, final layer (reference: model/dit.py:128-304).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .attention import MultiHeadAttention


class FeedForwardNet(nn.Module):
    """Dense -> GELU(tanh) -> Dense (reference model/dit.py:128-138)."""

    channels: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(int(self.channels * self.mlp_ratio), dtype=self.dtype, name="mlp_0")(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.channels, dtype=self.dtype, name="mlp_2")(h)


def _ln(name: str, affine: bool = False, out_dtype=None):
    """LayerNorm with fp32 statistics. out_dtype is ACCEPTED BUT IGNORED:
    casting the LN output to bf16 was measured SLOWER on the v5e DiT step
    (one 3B call 298.6 -> 316.5 ms, benchmarks/dit_profile.py) — the
    explicit cast breaks XLA's LN->modulate->matmul fusion and materializes
    an extra intermediate, costing more than the halved elementwise traffic
    saves. XLA already keeps the fp32 chain fused."""
    del out_dtype
    return nn.LayerNorm(
        epsilon=1e-6, use_bias=affine, use_scale=affine, name=name,
        # keep norm statistics in fp32 for bf16 activations
        dtype=jnp.float32,
    )


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, N, C); shift/scale: (B, C) broadcast over T, N."""
    return x * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]


class ModulatedTransformerCrossBlock(nn.Module):
    """DiT block: spatial self-attn over N, temporal self-attn over T, image
    cross-attn, static-GS cross-attn, MLP; adaLN-Zero modulation
    (reference model/dit.py:141-283 ModulatedSparseTransformerCrossBlock).

    Shapes: x (B,T,N,C); mod (B,C) raw cond — or, when share_mod, the
    pre-chunked (B, 9C or 6C) modulation; cond_images (B,T,L,C);
    static_latent (B,T,Ns,C).
    """

    channels: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_rope: bool = False
    qk_rms_norm: bool = False
    qk_rms_norm_cross: bool = False
    qkv_bias: bool = True
    share_mod: bool = False
    no_temporal_attn: bool = False
    # "transpose": [B,T,N,C]->[B*N,T,C] relayout + standard attention;
    # "einsum": transpose-free batched einsum over axis T (same params)
    temporal_layout: str = "transpose"
    # measurement-only: component names to skip entirely ("spatial",
    # "temporal", "img_cross", "static_cross", "mlp") or "temporal_attn"
    # (keep the temporal qkv/out projections, identity attention) — used by
    # benchmarks/dit_profile.py for whole-program cost deltas. NEVER set in
    # real configs; parameters stay identical so compiled-variant timings
    # are directly comparable.
    ablate: tuple = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mod: jnp.ndarray,
        cond_images: jnp.ndarray,
        static_latent: jnp.ndarray,
        indices: Optional[jnp.ndarray] = None,
        cross_kv=None,     # ((img_k, img_v), (static_k, static_v)) or None
        kv_only: bool = False,
    ):
        C = self.channels
        zero_out = nn.initializers.zeros

        if kv_only:
            # loop-invariant cross-attention KV for the sampling loop
            img_kv = static_kv = None
            if "img_cross" not in self.ablate:
                img_kv = MultiHeadAttention(
                    C, self.num_heads, ctx_channels=C, attn_type="cross",
                    qkv_bias=self.qkv_bias, qk_rms_norm=self.qk_rms_norm_cross,
                    dtype=self.dtype, name="image_cross_attn",
                )(None, cond_images.reshape(-1, cond_images.shape[2], C),
                  kv_only=True)
            if "static_cross" not in self.ablate:
                static_kv = MultiHeadAttention(
                    C, self.num_heads, ctx_channels=C, attn_type="cross",
                    qkv_bias=self.qkv_bias, qk_rms_norm=self.qk_rms_norm_cross,
                    dtype=self.dtype, name="static_cross_attn",
                )(None, static_latent.reshape(-1, static_latent.shape[2], C),
                  kv_only=True)
            return img_kv, static_kv

        if self.share_mod:
            n_chunks = 6 if self.no_temporal_attn else 9
            chunks = jnp.split(mod, n_chunks, axis=-1)
        else:
            m = nn.Dense(
                6 * C, dtype=self.dtype, kernel_init=zero_out, bias_init=zero_out,
                name="adaLN_modulation",
            )(nn.silu(mod))
            chunks = list(jnp.split(m, 6, axis=-1))
            if not self.no_temporal_attn:
                mt = nn.Dense(
                    3 * C, dtype=self.dtype, kernel_init=zero_out, bias_init=zero_out,
                    name="adaLN_modulation_temporal",
                )(nn.silu(mod))
                chunks = chunks[:3] + list(jnp.split(mt, 3, axis=-1)) + chunks[3:]

        if self.no_temporal_attn:
            (sh_s, sc_s, g_s, sh_m, sc_m, g_m) = chunks
        else:
            (sh_s, sc_s, g_s, sh_t, sc_t, g_t, sh_m, sc_m, g_m) = chunks

        B, T, N, _ = x.shape

        # spatial self attention (over N, batched across B*T)
        if "spatial" not in self.ablate:
            h = _ln("norm1", out_dtype=self.dtype)(x)
            h = modulate(h, sh_s, sc_s)
            h = MultiHeadAttention(
                C, self.num_heads, attn_type="self", qkv_bias=self.qkv_bias,
                use_rope=self.use_rope, qk_rms_norm=self.qk_rms_norm,
                dtype=self.dtype, name="spatial_self_attn",
            )(h.reshape(B * T, N, C), indices=indices).reshape(B, T, N, C)
            x = x + h * g_s[:, None, None, :]

        # temporal self attention (over T, batched across B*N)
        if not self.no_temporal_attn and "temporal" not in self.ablate:
            h = _ln("norm2", out_dtype=self.dtype)(x)
            h = modulate(h, sh_t, sc_t)
            attn = MultiHeadAttention(
                C, self.num_heads, attn_type="self", qkv_bias=self.qkv_bias,
                use_rope=self.use_rope, qk_rms_norm=self.qk_rms_norm,
                dtype=self.dtype, name="temporal_self_attn",
            )
            identity = "temporal_attn" in self.ablate
            if self.temporal_layout == "einsum" and not self.use_rope:
                h = attn(h, temporal_4d=True, attn_identity=identity)
            else:
                h = attn(h.transpose(0, 2, 1, 3).reshape(B * N, T, C),
                         attn_identity=identity)
                h = h.reshape(B, N, T, C).transpose(0, 2, 1, 3)
            x = x + h * g_t[:, None, None, :]

        # image cross attention (un-gated, affine pre-norm — reference :263-266)
        img_kv, static_kv = cross_kv if cross_kv is not None else (None, None)
        if "img_cross" not in self.ablate:
            h = _ln("norm3", affine=True, out_dtype=self.dtype)(x)
            h = MultiHeadAttention(
                C, self.num_heads, ctx_channels=C, attn_type="cross",
                qkv_bias=self.qkv_bias, qk_rms_norm=self.qk_rms_norm_cross,
                dtype=self.dtype, name="image_cross_attn",
            )(
                h.reshape(B * T, N, C),
                cond_images.reshape(B * T, cond_images.shape[2], C)
                if img_kv is None else None,
                context_kv=img_kv,
            ).reshape(B, T, N, C)
            x = x + h

        # static-GS cross attention
        if "static_cross" not in self.ablate:
            h = _ln("norm4", affine=True, out_dtype=self.dtype)(x)
            h = MultiHeadAttention(
                C, self.num_heads, ctx_channels=C, attn_type="cross",
                qkv_bias=self.qkv_bias, qk_rms_norm=self.qk_rms_norm_cross,
                dtype=self.dtype, name="static_cross_attn",
            )(
                h.reshape(B * T, N, C),
                static_latent.reshape(B * T, static_latent.shape[2], C)
                if static_kv is None else None,
                context_kv=static_kv,
            ).reshape(B, T, N, C)
            x = x + h

        # MLP
        if "mlp" not in self.ablate:
            h = _ln("norm5", out_dtype=self.dtype)(x)
            h = modulate(h, sh_m, sc_m)
            h = FeedForwardNet(C, self.mlp_ratio, dtype=self.dtype, name="mlp")(h)
            x = x + h * g_m[:, None, None, :]
        return x


class ModulatedCrossBlock(nn.Module):
    """Single-context DiT block: self-attn + cross-attn + MLP with adaLN-Zero
    (reference trellis/modules/transformer/modulated.py:76-150). Token shapes
    [B, L, C]; mod (B, C) or pre-chunked (B, 6C) when share_mod.
    """

    channels: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_rope: bool = False
    qk_rms_norm: bool = False
    qk_rms_norm_cross: bool = False
    qkv_bias: bool = True
    share_mod: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mod: jnp.ndarray,
        context: jnp.ndarray,
        indices: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        C = self.channels
        zero = nn.initializers.zeros
        if self.share_mod:
            chunks = jnp.split(mod, 6, axis=-1)
        else:
            m = nn.Dense(6 * C, dtype=self.dtype, kernel_init=zero, bias_init=zero,
                         name="adaLN_modulation")(nn.silu(mod))
            chunks = jnp.split(m, 6, axis=-1)
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = chunks

        h = _ln("norm1", out_dtype=self.dtype)(x)
        h = h * (1 + sc_a[:, None, :]) + sh_a[:, None, :]
        h = MultiHeadAttention(
            C, self.num_heads, attn_type="self", qkv_bias=self.qkv_bias,
            use_rope=self.use_rope, qk_rms_norm=self.qk_rms_norm,
            dtype=self.dtype, name="self_attn",
        )(h, indices=indices)
        x = x + h * g_a[:, None, :]

        h = _ln("norm2", affine=True, out_dtype=self.dtype)(x)
        h = MultiHeadAttention(
            C, self.num_heads, ctx_channels=context.shape[-1], attn_type="cross",
            qkv_bias=self.qkv_bias, qk_rms_norm=self.qk_rms_norm_cross,
            dtype=self.dtype, name="cross_attn",
        )(h, context)
        x = x + h

        h = _ln("norm3", out_dtype=self.dtype)(x)
        h = h * (1 + sc_m[:, None, :]) + sh_m[:, None, :]
        h = FeedForwardNet(C, self.mlp_ratio, dtype=self.dtype, name="mlp")(h)
        x = x + h * g_m[:, None, :]
        return x


class FinalLayer(nn.Module):
    """adaLN-modulated zero-init output projection (reference model/dit.py:287-303)."""

    hidden_size: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        zero_out = nn.initializers.zeros
        m = nn.Dense(
            2 * self.hidden_size, dtype=self.dtype, kernel_init=zero_out,
            bias_init=zero_out, name="adaLN_modulation",
        )(nn.silu(c))
        shift, scale = jnp.split(m, 2, axis=-1)
        x = _ln("norm_final")(x)
        x = modulate(x, shift, scale)
        return nn.Dense(
            self.out_channels, dtype=self.dtype, kernel_init=zero_out,
            bias_init=zero_out, name="linear",
        )(x)
