"""Dense attention library (reference: model/attention/{modules,full_attn}.py).

TPU-native: one code path through `jax.nn.dot_product_attention`, which XLA
lowers to a fused flash-style kernel on TPU — this replaces the reference's
four-way backend dispatch (xformers/flash_attn/sdpa/naive,
model/attention/full_attn.py:6-15). Layout is [B, L, H, Ch] throughout
(matching flash-attn's convention, and MXU-friendly: Ch on lanes).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


import os

# "fused": Pallas VMEM-resident kernel (TPU; falls back to xla off-TPU or on
#          unsupported shapes) — the default, it removes the HBM round-trips
#          of the [Lq, Lk] score matrix that dominate the narrow-head loop
# "xla":   jax.nn.dot_product_attention
# "einsum": plain two-einsum softmax attention
_ATTN_IMPL = os.environ.get("GVF_ATTN", "fused")


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[B, Lq, H, C] x [B, Lk, H, C] -> [B, Lq, H, C].

    GVF_ATTN picks the implementation; with the model family's narrow
    head_dim (32) the fused Pallas kernel is the fast path (see
    ops/fused_attention.py), masked/odd-shaped calls use the XLA lowering.
    """
    if _ATTN_IMPL == "fused" and mask is None and _on_tpu():
        from ..ops import fused_attention as fa

        # NOTE: auto-sequence-packing tiny self-attentions ([B*N, T=32] ->
        # [B*N/16, 512] with the kernel's segment_size mask) was tried for
        # the DiT temporal branch and MEASURED SLOWER end-to-end (9.83 s vs
        # 8.48 s for the 32-step denoise): the packing reshape lands right
        # after the [B,T,N,C]->[B*N,T,C] transpose and forces materialized
        # relayouts that cost more than the small-matmul inefficiency it
        # removes. The kernel keeps segment_size support (parity-tested) for
        # callers whose data is already packed.
        if fa.supports(q.shape, k.shape):
            return fa.fused_attention(q, k, v, q.shape[-1] ** -0.5)
    if _ATTN_IMPL == "einsum":
        scale = q.shape[-1] ** -0.5
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if mask is not None:
            logits = jnp.where(mask, logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
    return jax.nn.dot_product_attention(q, k, v, mask=mask)


class MultiHeadRMSNorm(nn.Module):
    """Per-head RMS norm on q/k (reference model/attention/modules.py:8-15):
    unit-normalize over head dim, scale by learned gamma * sqrt(dim)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.heads, self.dim))
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-12)
        return (normed * gamma * (self.dim**0.5)).astype(x.dtype)


class RotaryPositionEmbedder(nn.Module):
    """RoPE over (up to 3-D) integer/float positions, applied per head.

    Design follows reference model/attention/modules.py:18-61 but rotates per
    head-channel (the reference computes channel-count phases, which only
    broadcasts for a single head; we pad phases to head_dim//2 — the correct
    per-head generalization). Parameter-free.
    """

    head_dim: int
    in_channels: int = 3

    def _phases(self, indices: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        freq_dim = self.head_dim // self.in_channels // 2
        freqs = 1.0 / (
            10000.0 ** (jnp.arange(freq_dim, dtype=jnp.float32) / freq_dim)
        )
        ang = indices.astype(jnp.float32)[..., None] * freqs  # [..., D, freq_dim]
        ang = ang.reshape(*indices.shape[:-1], -1)  # [..., D*freq_dim]
        pad = self.head_dim // 2 - ang.shape[-1]
        if pad > 0:
            ang = jnp.concatenate(
                [ang, jnp.zeros(ang.shape[:-1] + (pad,), ang.dtype)], axis=-1
            )
        return jnp.cos(ang), jnp.sin(ang)

    def __call__(self, q, k, indices: Optional[jnp.ndarray] = None):
        """q, k: [B, L, H, Ch]; indices: [B, L, in_channels] positions."""
        if indices is None:
            idx = jnp.arange(q.shape[1], dtype=jnp.float32)[None, :, None]
            indices = jnp.broadcast_to(idx, (q.shape[0], q.shape[1], 1))
        cos, sin = self._phases(indices)  # [B, L, Ch//2]
        cos = cos[:, :, None, :]  # broadcast over heads
        sin = sin[:, :, None, :]

        def rot(x):
            xf = x.astype(jnp.float32)
            x_even = xf[..., 0::2]
            x_odd = xf[..., 1::2]
            r_even = x_even * cos - x_odd * sin
            r_odd = x_even * sin + x_odd * cos
            out = jnp.stack([r_even, r_odd], axis=-1).reshape(x.shape)
            return out.astype(x.dtype)

        return rot(q), rot(k)


class MultiHeadAttention(nn.Module):
    """Self/cross multi-head attention (reference model/attention/modules.py:64).

    attn_type: "self" packs qkv in one projection; "cross" projects q from x
    and kv from context. Optional qk RMS-norm and RoPE on 3-D indices.
    """

    channels: int
    num_heads: int
    ctx_channels: Optional[int] = None
    attn_type: str = "self"  # "self" | "cross"
    qkv_bias: bool = True
    use_rope: bool = False
    qk_rms_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        indices: Optional[jnp.ndarray] = None,
        context_kv=None,
        kv_only: bool = False,
        temporal_4d: bool = False,
        attn_identity: bool = False,
    ) -> jnp.ndarray:
        """Cross-attention KV caching: conditioning tokens are constant across
        sampler steps, so their K/V projections are loop-invariant. Call with
        kv_only=True (x ignored) to get the (k, v) pair once; pass it back via
        context_kv inside the sampling loop to skip the projections.

        temporal_4d: x is [B, T, N, C] and attention runs over axis 1 (T)
        with (B, N, heads) as batch dims — the transpose-free layout for the
        DiT temporal branch (same parameter tree as the standard self path,
        so the two layouts are checkpoint-interchangeable).
        """
        assert self.channels % self.num_heads == 0
        head_dim = self.channels // self.num_heads

        if temporal_4d:
            assert self.attn_type == "self" and not self.use_rope
            B, T, N, _ = x.shape
            qkv = nn.Dense(
                self.channels * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                name="to_qkv",
            )(x).reshape(B, T, N, 3, self.num_heads, head_dim)
            q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
            if self.qk_rms_norm:
                q = MultiHeadRMSNorm(head_dim, self.num_heads, name="q_rms_norm")(q)
                k = MultiHeadRMSNorm(head_dim, self.num_heads, name="k_rms_norm")(k)
            if attn_identity:  # measurement-only: projections without attention
                o = v
            else:
                from ..ops import fused_attention as fa

                scale = head_dim ** -0.5
                if (_ATTN_IMPL == "fused" and _on_tpu()
                        and fa.temporal_supports(q.shape)):
                    # native-layout Pallas kernel: the XLA batched einsum
                    # costs 68 ms/call at ~0.1% MFU (benchmarks/dit_profile)
                    o = fa.temporal_attention(q, k, v, scale)
                else:
                    s = jnp.einsum(
                        "btnhd,bsnhd->bnhts", q, k,
                        preferred_element_type=jnp.float32,
                    ) * scale
                    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
                    o = jnp.einsum("bnhts,bsnhd->btnhd", w, v)
            return nn.Dense(self.channels, dtype=self.dtype, name="to_out")(
                o.reshape(B, T, N, self.channels)
            )

        if kv_only:
            assert self.attn_type == "cross" and context is not None
            B, Lk = context.shape[:2]
            kv = nn.Dense(
                self.channels * 2, use_bias=self.qkv_bias, dtype=self.dtype,
                name="to_kv",
            )(context).reshape(B, Lk, 2, self.num_heads, head_dim)
            k, v = kv[:, :, 0], kv[:, :, 1]
            if self.qk_rms_norm:
                k = MultiHeadRMSNorm(head_dim, self.num_heads, name="k_rms_norm")(k)
            return k, v

        B, L, _ = x.shape
        if self.attn_type == "self":
            qkv = nn.Dense(
                self.channels * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                name="to_qkv",
            )(x)
            qkv = qkv.reshape(B, L, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if self.use_rope:
                q, k = RotaryPositionEmbedder(head_dim, name="rope")(q, k, indices)
            if self.qk_rms_norm:
                q = MultiHeadRMSNorm(head_dim, self.num_heads, name="q_rms_norm")(q)
                k = MultiHeadRMSNorm(head_dim, self.num_heads, name="k_rms_norm")(k)
        else:
            q = nn.Dense(
                self.channels, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q"
            )(x).reshape(B, L, self.num_heads, head_dim)
            if self.qk_rms_norm:
                q = MultiHeadRMSNorm(head_dim, self.num_heads, name="q_rms_norm")(q)
            if context_kv is not None:
                k, v = context_kv  # pre-normed in kv_only
            else:
                assert context is not None, "cross attention requires context"
                Lk = context.shape[1]
                kv = nn.Dense(
                    self.channels * 2, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="to_kv",
                )(context).reshape(B, Lk, 2, self.num_heads, head_dim)
                k, v = kv[:, :, 0], kv[:, :, 1]
                if self.qk_rms_norm:
                    k = MultiHeadRMSNorm(head_dim, self.num_heads, name="k_rms_norm")(k)

        h = v if attn_identity else scaled_dot_product_attention(q, k, v)
        h = h.reshape(B, L, self.channels)
        return nn.Dense(self.channels, dtype=self.dtype, name="to_out")(h)
