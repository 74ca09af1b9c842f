"""Transformer building blocks: FFN, adaLN-modulated spatio-temporal cross
block, final layer (reference: model/dit.py:128-304).
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import MultiHeadAttention
from ..ops import fused_sublayer as fsl

def _fused_mode() -> str:
    """GVF_FUSED env (read per call so tests can switch):
    "auto": fused sublayer kernels on TPU when shapes support them
    (inference hot path; one HBM round-trip per sublayer — see
    ops/fused_sublayer.py); "off": always the composed XLA path;
    "interpret": force fused kernels in Pallas interpret mode (CPU tests
    exercise the exact fused code path)."""
    mode = os.environ.get("GVF_FUSED", "auto")
    if mode in ("off", "interpret"):
        return mode
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    return "on" if on_tpu else "off"


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact tree (kernel/bias names,
    shapes, inits) — lets the fused-sublayer kernels read raw weights while
    staying checkpoint-interchangeable with the composed module path."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else jnp.zeros((self.features,)))
        return kernel, bias


class _GammaParams(nn.Module):
    """MultiHeadRMSNorm's gamma, returned as the lane vector the fused
    kernels consume: gamma.flatten() * sqrt(dim)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self):
        gamma = self.param("gamma", nn.initializers.ones,
                           (self.heads, self.dim))
        return gamma.reshape(-1) * (self.dim ** 0.5)


class _AffineLNParams(nn.Module):
    """flax LayerNorm's scale/bias params (affine pre-norms norm3/norm4)."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class _SelfAttnParams(nn.Module):
    """Param tree mirror of MultiHeadAttention(attn_type='self')."""

    channels: int
    num_heads: int
    qkv_bias: bool = True
    qk_rms_norm: bool = False

    @nn.compact
    def __call__(self):
        C = self.channels
        D = C // self.num_heads
        wqkv, bqkv = _DenseParams(C, 3 * C, self.qkv_bias, name="to_qkv")()
        if self.qk_rms_norm:
            qg = _GammaParams(D, self.num_heads, name="q_rms_norm")()
            kg = _GammaParams(D, self.num_heads, name="k_rms_norm")()
        else:
            qg = kg = jnp.ones((C,))
        wo, bo = _DenseParams(C, C, True, name="to_out")()
        return wqkv, bqkv, qg, kg, wo, bo


class _CrossAttnParams(nn.Module):
    """Param tree mirror of MultiHeadAttention(attn_type='cross') minus the
    to_kv projection (the sampler's loop-invariant KV cache owns that)."""

    channels: int
    num_heads: int
    qkv_bias: bool = True
    qk_rms_norm: bool = False

    @nn.compact
    def __call__(self):
        C = self.channels
        D = C // self.num_heads
        wq, bq = _DenseParams(C, C, self.qkv_bias, name="to_q")()
        qg = (_GammaParams(D, self.num_heads, name="q_rms_norm")()
              if self.qk_rms_norm else jnp.ones((C,)))
        wo, bo = _DenseParams(C, C, True, name="to_out")()
        return wq, bq, qg, wo, bo


class _MlpParams(nn.Module):
    """Param tree mirror of FeedForwardNet."""

    channels: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self):
        C = self.channels
        M = int(C * self.mlp_ratio)
        w1, b1 = _DenseParams(C, M, True, name="mlp_0")()
        w2, b2 = _DenseParams(M, C, True, name="mlp_2")()
        return w1, b1, w2, b2


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
            if (os.environ.get("GVF_KV_QUANT") == "int8"
                    and _fused_mode() != "off"
                    and img_kv is not None and static_kv is not None):
                # int8 KV cache (per-token-per-head scales): quantize ONCE
                # here; the fused cross kernel dequants in VMEM per use.
                # The KV re-read is the denoise loop's largest HBM stream.
                def q(kv):
                    k, v = kv
                    bt, lk = k.shape[0], k.shape[1]
                    kq, ks = fsl.quantize_kv(k.reshape(bt, lk, C),
                                             self.num_heads)
                    vq, vs = fsl.quantize_kv(v.reshape(bt, lk, C),
                                             self.num_heads)
                    # K scales transposed [BT, H, Lk]: the int8-QK kernel
                    # consumes them as per-head rows, no in-kernel transpose
                    return kq, vq, ks.swapaxes(1, 2), vs

                return q(img_kv), q(static_kv)
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

        fmode = _fused_mode()
        if (fmode != "off" and not self.ablate and not self.use_rope
                and cross_kv is not None
                and cross_kv[0] is not None and cross_kv[1] is not None
                and fsl.self_sublayer_supports(B * T, N, C, self.num_heads)
                and (self.no_temporal_attn or fsl.temporal_sublayer_supports(
                    B, T, N, C, self.num_heads))
                and fsl.cross_sublayer_supports(
                    B * T, N, C, self.num_heads,
                    cross_kv[0][0].shape[1], cross_kv[1][0].shape[1])
                and fsl.mlp_sublayer_supports(
                    B * T, N, C, int(C * self.mlp_ratio))):
            return self._fused_call(x, chunks, cross_kv,
                                    interpret=(fmode == "interpret"))

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

        def _maybe_dequant(kv):
            # int8 cache built for the fused path but this call fell back to
            # the composed path (unsupported shape / GVF_FUSED=off):
            # dequantize to the plain (k, v) [BT, Lk, H, D] cache format
            if kv is not None and len(kv) == 4:
                kq, vq, ks_t, vs = kv
                bt, lk = kq.shape[0], kq.shape[1]
                D = C // self.num_heads
                return (
                    fsl.dequantize_kv(kq, ks_t.swapaxes(1, 2)).astype(
                        self.dtype).reshape(bt, lk, self.num_heads, D),
                    fsl.dequantize_kv(vq, vs).astype(self.dtype).reshape(
                        bt, lk, self.num_heads, D),
                )
            return kv

        img_kv = _maybe_dequant(img_kv)
        static_kv = _maybe_dequant(static_kv)
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

    def _fused_call(self, x, chunks, cross_kv, interpret: bool):
        """Fused-sublayer path: each sublayer is ONE Pallas kernel with
        VMEM-resident weights (ops/fused_sublayer.py) — same parameter tree,
        same math, one HBM round-trip of the residual stream per sublayer."""
        C = self.channels
        H = self.num_heads
        dt = self.dtype
        B, T, N, _ = x.shape
        if self.no_temporal_attn:
            (sh_s, sc_s, g_s, sh_m, sc_m, g_m) = chunks
            sh_t = sc_t = g_t = None
        else:
            (sh_s, sc_s, g_s, sh_t, sc_t, g_t, sh_m, sc_m, g_m) = chunks
        w = lambda a: a.astype(dt)
        # measurement-only (benchmarks): skip individual fused kernels so
        # whole-program deltas attribute in-situ cost. NEVER set in configs.
        skip = set(os.environ.get("GVF_FUSED_ABLATE", "").split(","))

        # int8 QK for the self kernels (GVF_SELF_QUANT=int8): both operands
        # of the dominant packed QK dot quantize in-kernel with per-(cell,
        # head) max-abs scales — 2x MXU rate on the 4x-lane-packed narrow-
        # head contraction; AV stays bf16. Inference-only (the bwd runs the
        # float reference), drift bounded in tests/test_fused_sublayer.py.
        sq = os.environ.get("GVF_SELF_QUANT", "") == "int8"

        # spatial self attention (norm1 is non-affine, fused into the kernel)
        wqkv, bqkv, qg, kg, wo, bo = _SelfAttnParams(
            C, H, self.qkv_bias, self.qk_rms_norm, name="spatial_self_attn")()
        if "spatial" not in skip:
            x = fsl.fused_self_sublayer(
                x.reshape(B * T, N, C), w(sh_s), w(sc_s), w(g_s), w(wqkv),
                w(bqkv), w(qg), w(kg), w(wo), w(bo), num_heads=H,
                rms=self.qk_rms_norm, compute_dtype=dt, mod_repeat=T,
                interpret=interpret, quant_qk=sq,
            ).reshape(B, T, N, C)

        # temporal self attention in the native [B, T, N, C] layout
        if not self.no_temporal_attn and "temporal" not in skip:
            wqkv, bqkv, qg, kg, wo, bo = _SelfAttnParams(
                C, H, self.qkv_bias, self.qk_rms_norm,
                name="temporal_self_attn")()
            x = fsl.fused_temporal_sublayer(
                x, w(sh_t), w(sc_t), w(g_t), w(wqkv), w(bqkv), w(qg), w(kg),
                w(wo), w(bo), num_heads=H, rms=self.qk_rms_norm,
                compute_dtype=dt, interpret=interpret, quant_qk=sq,
            )

        # image + static cross attention, chained in one kernel
        img_kv, static_kv = cross_kv
        n3 = _AffineLNParams(C, name="norm3")()
        wq1, bq1, qg1, wo1, bo1 = _CrossAttnParams(
            C, H, self.qkv_bias, self.qk_rms_norm_cross,
            name="image_cross_attn")()
        n4 = _AffineLNParams(C, name="norm4")()
        wq2, bq2, qg2, wo2, bo2 = _CrossAttnParams(
            C, H, self.qkv_bias, self.qk_rms_norm_cross,
            name="static_cross_attn")()
        quant = len(img_kv) == 4

        def pack(kv):
            if len(kv) == 4:  # int8 cache: already lane-packed + scales
                return kv
            return (kv[0].reshape(kv[0].shape[0], kv[0].shape[1], C),
                    kv[1].reshape(kv[1].shape[0], kv[1].shape[1], C))

        def wkv(kv):
            if len(kv) == 4:
                return kv  # int8 values + bf16 scales, stored as-is
            return (w(kv[0]), w(kv[1]))

        if "cross" not in skip:
            # at the 3-way-CFG batch (B=3 -> BT=96 grid cells) the whole-N
            # quant kernel's scoped VMEM lands 1.4M over the 16M limit
            # (int8 K/V + scale streams on top of the bf16 buffers); grid
            # the query rows to halve the per-instance allocation. B<=2
            # keeps the whole-N form that the single-CFG bench measured.
            lq = N // 2 if (quant and B * T > 64 and N % 2 == 0) else 0
            x = fsl.fused_cross_sublayer(
                x.reshape(B * T, N, C),
                (w(n3[0]), w(n3[1]), w(wq1), w(bq1), w(qg1), w(wo1), w(bo1)),
                wkv(pack(img_kv)),
                (w(n4[0]), w(n4[1]), w(wq2), w(bq2), w(qg2), w(wo2), w(bo2)),
                wkv(pack(static_kv)),
                num_heads=H, rms=self.qk_rms_norm_cross, compute_dtype=dt,
                quant=quant, interpret=interpret, lq_block=lq,
            ).reshape(B, T, N, C)

        # MLP
        w1, b1, w2, b2 = _MlpParams(C, self.mlp_ratio, name="mlp")()
        if "mlp" not in skip:
            x = fsl.fused_mlp_sublayer(
                x.reshape(B * T, N, C), w(sh_m), w(sc_m), w(g_m), w(w1),
                w(b1), w(w2), w(b2), compute_dtype=dt, mod_repeat=T,
                interpret=interpret,
            ).reshape(B, T, N, C)
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
