"""Motion VAE: Direct 4DMesh-to-GS Variation Field VAE.

Re-design of the reference's GSKLTemporalVariationalAutoEncoder
(model/autoencoder.py:345-640), a 3dshape2vecset-style perceiver:

  encode: FPS-sample `num_latents` anchor Gaussians from the canonical GS,
  KNN-interpolate the point-cloud motion deltas onto them, cross-attend
  anchors -> full delta cloud, project to a diagonal-Gaussian posterior.

  decode: `depth` self-attention blocks over the latent set, then cross-attn
  from GS queries (gs_embedding + PointEmbed PE) to produce a
  `output_dim`-channel delta per Gaussian per frame, zero-init output.

TPU-first: everything is dense [B*T, L, D] attention (MXU), padded static
shapes; the reference's 8192-query chunking + torch checkpointing
(model/autoencoder.py:552-607) becomes optional `nn.remat` over the query
cross-attention — XLA's scheduler handles the rest.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.fps import fps_masked
from ..ops.knn import interpolate_deltas


class PointEmbed(nn.Module):
    """Per-axis sinusoidal point embedding (reference model/autoencoder.py:250).

    Layout per point: [sin(x*w), cos(x*w), sin(y*w), cos(y*w), sin(z*w), cos(z*w)]
    with omega_i = 10000^(-i/(e/2)), e = hidden_dim//6. Parameter-free.
    """

    hidden_dim: int

    def __call__(self, p: jnp.ndarray) -> jnp.ndarray:
        e = self.hidden_dim // 3 // 2
        omega = 1.0 / (10000.0 ** (jnp.arange(e, dtype=jnp.float32) / (e / 2.0)))
        ang = p.astype(jnp.float32)[..., None] * omega  # [..., 3, e]
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [..., 3, 2e]
        return emb.reshape(*p.shape[:-1], -1).astype(p.dtype)


class GEGLU(nn.Module):
    def __call__(self, x):
        x, gates = jnp.split(x, 2, axis=-1)
        # exact (erf) gelu — reference F.gelu default (model/autoencoder.py:93)
        return x * nn.gelu(gates, approximate=False)


class PerceiverFF(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * self.mult * 2, dtype=self.dtype, name="net_0")(x)
        h = GEGLU()(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class PerceiverAttention(nn.Module):
    """Pre-norm cross/self attention, q/kv bias-free (reference :109-165)."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        B, N, _ = x.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, ctx.shape[1], self.heads, self.dim_head)
        v = v.reshape(B, ctx.shape[1], self.heads, self.dim_head)
        out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(B, N, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


def _prenorm(name, eps=1e-6):
    # PreNorm blocks use eps=1e-6 (reference model/autoencoder.py:77);
    # the embedding LayerNorms use torch's default 1e-5 (reference :389-391)
    return nn.LayerNorm(epsilon=eps, use_bias=False, use_scale=False,
                        dtype=jnp.float32, name=name)


class MotionVAE(nn.Module):
    """See module docstring. Config mirrors configs/diffusion.yml:27-39."""

    depth: int = 12
    dim: int = 768
    queries_dim: int = 768
    input_dim: int = 3
    gs_dim: int = 14
    output_dim: int = 14
    num_inputs: int = 8192
    num_latents: int = 512
    latent_dim: int = 16
    heads: int = 12
    knn_k: int = 8
    beta: float = 7.0
    remat_decode: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def dim_head(self) -> int:
        return self.dim // self.heads

    def setup(self):
        if self.dim % 6 != 0:
            # PointEmbed emits 6*(dim//6) channels which are summed with the
            # dim-wide input embedding (reference asserts hidden_dim % 3 == 0,
            # model/autoencoder.py:254; the exact-width constraint is % 6).
            raise ValueError(f"MotionVAE dim must be divisible by 6, got {self.dim}")
        init = nn.initializers.truncated_normal(0.02)
        d = dict(dtype=self.dtype)
        self.input_embedding = nn.Dense(self.dim, kernel_init=init, name="input_embedding", **d)
        self.gs_embedding = nn.Dense(self.dim, kernel_init=init, name="gs_embedding", **d)
        self.point_embed = PointEmbed(self.dim)
        self.embed_norm_in = _prenorm("input_embed_norm", eps=1e-5)
        self.embed_norm_gs = _prenorm("gs_embed_norm", eps=1e-5)
        self.embed_norm_pe = _prenorm("pe_norm", eps=1e-5)

        # encoder cross block
        self.enc_norm_q = _prenorm("enc_norm_q")
        self.enc_norm_ctx = _prenorm("enc_norm_ctx")
        self.enc_cross = PerceiverAttention(
            self.dim, self.dim, self.heads, self.dim_head, name="enc_cross", dtype=self.dtype
        )
        self.enc_ff_norm = _prenorm("enc_ff_norm")
        self.enc_ff = PerceiverFF(self.dim, name="enc_ff", dtype=self.dtype)

        self.mean_fc = nn.Dense(self.latent_dim, kernel_init=init, name="mean_fc")
        self.logvar_fc = nn.Dense(self.latent_dim, kernel_init=init, name="logvar_fc")
        self.proj = nn.Dense(self.dim, kernel_init=init, name="proj", dtype=self.dtype)

        self.layer_norms_attn = [_prenorm(f"latent_norm_attn_{i}") for i in range(self.depth)]
        self.layer_attns = [
            PerceiverAttention(self.dim, None, self.heads, self.dim_head,
                               name=f"latent_attn_{i}", dtype=self.dtype)
            for i in range(self.depth)
        ]
        self.layer_norms_ff = [_prenorm(f"latent_norm_ff_{i}") for i in range(self.depth)]
        self.layer_ffs = [
            PerceiverFF(self.dim, name=f"latent_ff_{i}", dtype=self.dtype)
            for i in range(self.depth)
        ]

        self.dec_norm_q = _prenorm("dec_norm_q")
        self.dec_norm_ctx = _prenorm("dec_norm_ctx")
        self.dec_cross = PerceiverAttention(
            self.queries_dim, self.dim, self.heads, self.dim_head,
            name="dec_cross", dtype=self.dtype,
        )
        self.to_outputs = nn.Dense(
            self.output_dim, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="to_outputs",
        )

    # -- encoder -----------------------------------------------------------

    def sample_anchors(self, static_gs: jnp.ndarray, valid: jnp.ndarray):
        """FPS `num_latents` anchors from padded static GS [B, G, 14]."""
        idx = jax.vmap(lambda p, v: fps_masked(p, v, self.num_latents))(
            static_gs[..., :3], valid
        )
        sampled = jnp.take_along_axis(static_gs, idx[..., None], axis=1)
        return sampled, idx

    def encode(
        self,
        static_pc: jnp.ndarray,   # [B, N, 3] canonical point cloud
        delta_pc: jnp.ndarray,    # [B, T, N, 3] per-frame deltas
        static_gs: jnp.ndarray,   # [B, G, 14] padded canonical Gaussians
        gs_valid: jnp.ndarray,    # [B, G] bool mask of real Gaussians
    ):
        """Returns (kl [B*T], mean, logvar [B*T, L, latent_dim], sampled_gs)."""
        B, T = delta_pc.shape[:2]

        sampled_gs, _ = self.sample_anchors(static_gs, gs_valid)
        anchors = sampled_gs[..., :3]  # [B, L, 3]

        est_deltas = interpolate_deltas(
            anchors, static_pc, delta_pc, k=self.knn_k, beta=self.beta
        )  # [B, T, L, 3]

        pe_anchor = self.embed_norm_pe(self.point_embed(anchors))  # [B, L, D]
        q = self.embed_norm_in(self.input_embedding(est_deltas)) + pe_anchor[:, None]
        q = q.reshape(B * T, self.num_latents, self.dim)

        pe_pc = self.embed_norm_pe(self.point_embed(static_pc))  # [B, N, D]
        ctx = self.embed_norm_in(self.input_embedding(delta_pc)) + pe_pc[:, None]
        ctx = ctx.reshape(B * T, static_pc.shape[1], self.dim)

        x = self.enc_cross(self.enc_norm_q(q), self.enc_norm_ctx(ctx)) + q
        x = self.enc_ff(self.enc_ff_norm(x)) + x

        mean = self.mean_fc(x)
        logvar = jnp.clip(self.logvar_fc(x), -30.0, 20.0)
        kl = 0.5 * jnp.mean(mean**2 + jnp.exp(logvar) - 1.0 - logvar, axis=(1, 2))
        return kl, mean, logvar, sampled_gs

    # -- decoder -----------------------------------------------------------

    def decode(self, z: jnp.ndarray, queries: jnp.ndarray, num_timesteps: int,
               chunk_size: Optional[int] = None):
        """z [B*T, L, latent_dim]; queries [B, Q, gs_dim] padded static GS.

        Returns [B, T, Q, output_dim] per-Gaussian per-frame deltas.

        chunk_size: process the query cross-attention in chunks of this many
        Gaussians (reference chunking, model/autoencoder.py:552-607) — the
        [B*T, Q, dim] query embedding at Q~100k Gaussians would not fit HBM.
        """
        T = num_timesteps
        B, Q = queries.shape[:2]
        x = self.proj(z)
        for norm_a, attn, norm_f, ff in zip(
            self.layer_norms_attn, self.layer_attns, self.layer_norms_ff, self.layer_ffs
        ):
            x = attn(norm_a(x)) + x
            x = ff(norm_f(x)) + x
        ctx = self.dec_norm_ctx(x)

        def run_queries(q_chunk):
            Qc = q_chunk.shape[1]
            q_embed = self.embed_norm_gs(self.gs_embedding(q_chunk)) + (
                self.embed_norm_pe(self.point_embed(q_chunk[..., :3]))
            )  # [B, Qc, D]
            q_embed = jnp.broadcast_to(q_embed[:, None], (B, T, Qc, self.dim))
            q_embed = q_embed.reshape(B * T, Qc, self.dim)
            h = self.dec_cross(self.dec_norm_q(q_embed), ctx)
            return self.to_outputs(h).reshape(B, T, Qc, self.output_dim)

        if chunk_size is None or Q <= chunk_size:
            return run_queries(queries)
        assert Q % chunk_size == 0, "pad queries to a chunk multiple"
        outs = [
            run_queries(queries[:, s : s + chunk_size])
            for s in range(0, Q, chunk_size)
        ]
        return jnp.concatenate(outs, axis=2)

    def reparameterize(self, rng, mean, logvar):
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def __call__(self, static_gs, gs_valid, static_pc, delta_pc, rng):
        """Full encode->sample->decode. Returns dict with logits/kl/mean/logvar."""
        B, T = delta_pc.shape[:2]
        kl, mean, logvar, _sampled = self.encode(static_pc, delta_pc, static_gs, gs_valid)
        z = self.reparameterize(rng, mean, logvar)
        logits = self.decode(z, static_gs, T)
        return {"logits": logits, "kl": kl, "mean": mean, "logvar": logvar}


def pad_static_gs(gs_list, pad_to=None):
    """Pad a list of [Gi, 14] arrays to [B, G, 14] + bool valid mask.

    Padding rows get rotation w=1 (index 10), mirroring the reference's
    pad_static_gs (model/autoencoder.py:607-616) so padded Gaussians stay
    valid quaternions.
    """
    import numpy as np

    max_len = pad_to or max(g.shape[0] for g in gs_list)
    B = len(gs_list)
    out = np.zeros((B, max_len, gs_list[0].shape[1]), dtype=np.float32)
    out[:, :, 10] = 1.0
    valid = np.zeros((B, max_len), dtype=bool)
    for i, g in enumerate(gs_list):
        out[i, : g.shape[0]] = np.asarray(g)
        valid[i, : g.shape[0]] = True
    return jnp.asarray(out), jnp.asarray(valid)
