"""TRELLIS structured-latent (SLat) flow model: sparse U-DiT.

Re-design of reference trellis/models/structured_latent_flow.py:14-262:
SparseResBlock3d io-blocks (conv + downsample/upsample with skip
connections) around a stack of modulated sparse transformer cross blocks
(full sparse self-attn + cross-attn to DINOv2 tokens).

The up/down structure pairing is explicit here: each downsample pushes its
(child-structure, child->parent map) onto a stack that the matching upsample
pops — replacing the reference's spatial-cache side channel
(sparse/conv/conv_spconv.py:54-74 inverse-conv cache semantics).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.embedders import AbsolutePositionEmbedder, TimestepEmbedder
from ...nn.attention import MultiHeadRMSNorm  # noqa: F401 (re-export convenience)
from ...sparse.attention import SparseMultiHeadAttention
from ...sparse.conv import SparseConv3d
from ...sparse.ops import (
    SparseLayerNorm, SparseLinear, sparse_downsample, sparse_upsample,
)
from ...sparse.tensor import SparseVoxels


class SparseResBlock3d(nn.Module):
    """Timestep-modulated sparse conv ResBlock, optional 2x down/up sampling
    (reference structured_latent_flow.py:14-66)."""

    channels: int
    emb_channels: int
    out_channels: Optional[int] = None
    downsample: bool = False
    upsample: bool = False
    # downsample blocks only: compact the parent set to this padded capacity
    # BEFORE the conv body. A 2x downsample leaves ~1/8 of slots valid, and
    # both this block's convs and the downstream torso otherwise pay for the
    # dead padding. The child->parent map is remapped into compacted slots so
    # the paired upsample gathers work unchanged.
    compact_to: Optional[int] = None
    # measurement-only (benchmarks/slat_profile.py): skip the conv body,
    # keeping resampling + the channel-matching skip projection
    ablate_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: SparseVoxels,
        emb: jnp.ndarray,
        up_structure: Optional[Tuple[SparseVoxels, jnp.ndarray]] = None,
    ):
        """Returns (out, down_structure or None). For upsample blocks pass the
        matching (child_template, child_to_parent) via `up_structure`."""
        out_ch = self.out_channels or self.channels
        down_struct = None

        if self.downsample:
            from ...sparse.ops import sparse_compact

            template = x
            res = sparse_downsample(x, 2)
            x = res.parents
            c2p = res.child_to_parent
            if self.compact_to is not None and self.compact_to < x.capacity:
                x, slots = sparse_compact(x, self.compact_to)
                # old->new parent slot map; children of truncated parents
                # (capacity overflow) fall back to -1 like invalid children
                b, l = c2p.shape[0], template.capacity
                nc = slots.shape[1]

                def inv_b(slots_b):
                    idx = jnp.where(slots_b >= 0, slots_b, l)
                    return jnp.full((l,), -1, jnp.int32).at[idx].set(
                        jnp.arange(nc, dtype=jnp.int32), mode="drop"
                    )

                inv = jax.vmap(inv_b)(slots)
                c2p = jnp.where(
                    c2p >= 0,
                    jnp.take_along_axis(inv, jnp.maximum(c2p, 0), axis=1),
                    -1,
                )
            down_struct = (template, c2p)
        elif self.upsample:
            assert up_structure is not None, "upsample needs the paired structure"
            child_template, c2p = up_structure
            # Every child DUPLICATES its parent's features, so the whole
            # prefix (norm1+silu, the conv1 projections, the skip linear)
            # commutes with the upsample gather and runs at PARENT count —
            # measured: the up-block was the single largest SLat-flow
            # component (55 ms of a 203 ms 2B call, benchmarks/slat_profile)
            # with conv1's 1024-wide child gathers dominating. Exact algebra,
            # identical params (norm1/conv1/skip_connection names unchanged).
            parent = x
            if self.channels != out_ch:
                skip_p = SparseLinear(
                    out_ch, dtype=self.dtype, name="skip_connection")(parent)
            else:
                skip_p = parent
            skip = sparse_upsample(skip_p, child_template, c2p)
            if self.ablate_conv:
                return skip, down_struct

            emb_out = nn.Dense(
                2 * out_ch, dtype=self.dtype, name="emb_layers",
            )(nn.silu(emb))
            scale, shift = jnp.split(emb_out, 2, axis=-1)

            hp = SparseLayerNorm(affine=True, name="norm1")(parent)
            hp = hp.map_feats(nn.silu)
            h = SparseConv3d(out_ch, 3, dtype=self.dtype, name="conv1")(
                child_template, parent=hp, c2p=c2p)
            h = SparseLayerNorm(affine=False, name="norm2")(h)
            h = h.replace_feats(h.feats * (1 + scale[:, None]) + shift[:, None])
            h = h.map_feats(nn.silu)
            h = SparseConv3d(
                out_ch, 3, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                name="conv2",
            )(h)
            out = h + skip.feats
            return out, down_struct

        if self.channels != out_ch:
            skip = SparseLinear(out_ch, dtype=self.dtype, name="skip_connection")(x)
        else:
            skip = x
        if self.ablate_conv:
            return skip, down_struct

        emb_out = nn.Dense(
            2 * out_ch, dtype=self.dtype, name="emb_layers",
        )(nn.silu(emb))
        scale, shift = jnp.split(emb_out, 2, axis=-1)

        h = SparseLayerNorm(affine=True, name="norm1")(x)
        h = h.map_feats(nn.silu)
        h = SparseConv3d(out_ch, 3, dtype=self.dtype, name="conv1")(h)
        h = SparseLayerNorm(affine=False, name="norm2")(h)
        h = h.replace_feats(h.feats * (1 + scale[:, None]) + shift[:, None])
        h = h.map_feats(nn.silu)
        h = SparseConv3d(
            out_ch, 3, kernel_init=nn.initializers.zeros, dtype=self.dtype,
            name="conv2",
        )(h)
        out = h + skip.feats
        return out, down_struct


class ModulatedSparseCrossBlock(nn.Module):
    """Sparse self-attn + cross-attn + MLP with adaLN-Zero (reference
    trellis/modules/sparse/transformer/modulated.py ModulatedSparseTransformerCrossBlock)."""

    channels: int
    num_heads: int
    mlp_ratio: float = 4.0
    qk_rms_norm: bool = False
    qk_rms_norm_cross: bool = False
    share_mod: bool = False
    # measurement-only whole-program ablation (benchmarks/slat_profile.py):
    # any of {"self", "cross", "mlp"} skips that sub-layer so its cost can be
    # attributed by delta against the full program. Not for real inference.
    ablate: tuple = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels, mod: jnp.ndarray, context: jnp.ndarray):
        from ..static_vae import SparseFeedForward

        C = self.channels
        zero = nn.initializers.zeros
        if self.share_mod:
            chunks = jnp.split(mod, 6, axis=-1)
        else:
            m = nn.Dense(6 * C, dtype=self.dtype, kernel_init=zero, bias_init=zero,
                         name="adaLN_modulation")(nn.silu(mod))
            chunks = jnp.split(m, 6, axis=-1)
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = chunks

        if "self" not in self.ablate:
            h = SparseLayerNorm(affine=False, name="norm1")(x)
            h = h.replace_feats(h.feats * (1 + sc_a[:, None]) + sh_a[:, None])
            h = SparseMultiHeadAttention(
                C, self.num_heads, attn_mode="full", qk_rms_norm=self.qk_rms_norm,
                dtype=self.dtype, name="self_attn",
            )(h)
            x = x + h.feats * g_a[:, None]

        if "cross" not in self.ablate:
            if self._fused_cross_ok(x, context):
                x = self._fused_cross(x, context)
            else:
                h = SparseLayerNorm(affine=True, name="norm2")(x)
                h = SparseMultiHeadAttention(
                    C, self.num_heads, attn_type="cross",
                    qk_rms_norm=self.qk_rms_norm_cross, dtype=self.dtype,
                    name="cross_attn",
                )(h, context)
                x = x + h.feats

        if "mlp" not in self.ablate:
            h = SparseLayerNorm(affine=False, name="norm3")(x)
            h = h.replace_feats(h.feats * (1 + sc_m[:, None]) + sh_m[:, None])
            h = SparseFeedForward(C, self.mlp_ratio, dtype=self.dtype, name="mlp")(h)
            x = x + h.feats * g_m[:, None]
        return x

    def _fused_cross_ok(self, x, context) -> bool:
        from ...nn.transformer import _fused_mode

        C = self.channels
        L = x.feats.shape[1]
        return (
            _fused_mode() != "off"
            and not self.qk_rms_norm_cross  # kv rms would sit outside kernel
            and C % 128 == 0
            and 128 % (C // self.num_heads) == 0
            and L % (128 if C > 512 else 512 if L % 512 == 0 else 128) == 0
            and L % 128 == 0
        )

    def _fused_cross(self, x, context):
        """Cross sublayer as ONE Pallas kernel (affine LN + q proj +
        attention + out proj + residual; ops/fused_sublayer.py). KV is
        projected in XLA (a fast matmul emitter) and streamed single-buffered
        into L-gridded cells — C=1024 KV tiles don't fit double-buffered."""
        from ...nn.transformer import (
            _AffineLNParams, _DenseParams, _fused_mode,
        )
        from ...ops import fused_sublayer as fsl

        C = self.channels
        dt = self.dtype
        B, L, _ = x.feats.shape
        Lk = context.shape[1]

        class _LNChild(nn.Module):
            @nn.compact
            def __call__(self):
                return _AffineLNParams(C, name="LayerNorm_0")()

        ns, nb = _LNChild(name="norm2")()

        class _CrossP(nn.Module):
            @nn.compact
            def __call__(self):
                wq, bq = _DenseParams(C, C, True, name="to_q")()
                wkv, bkv = _DenseParams(C, 2 * C, True, name="to_kv")()
                wo, bo = _DenseParams(C, C, True, name="to_out")()
                return wq, bq, wkv, bkv, wo, bo

        wq, bq, wkv, bkv, wo, bo = _CrossP(name="cross_attn")()
        kv = jnp.einsum("blc,cd->bld", context.astype(dt), wkv.astype(dt),
                        preferred_element_type=jnp.float32) + bkv
        k, v = kv[..., :C].astype(dt), kv[..., C:].astype(dt)
        w = lambda a: a.astype(dt)
        feats = fsl.fused_cross_sublayer(
            x.feats, (w(ns), w(nb), w(wq), w(bq), jnp.ones((C,), dt),
                      w(wo), w(bo)),
            (k, v), num_heads=self.num_heads, rms=False, compute_dtype=dt,
            interpret=(_fused_mode() == "interpret"),
            lq_block=(128 if C > 512 else 0), kv_buffers=(1 if C > 512 else 2),
        )
        return x.replace_feats(feats)


class SLatFlowModel(nn.Module):
    """See module docstring. Default config mirrors the released
    slat_flow_img_dit_L_64l8p2 (64^3 res, patch 2, io channels [128, ...])."""

    resolution: int = 64
    in_channels: int = 8
    model_channels: int = 1024
    cond_channels: int = 1024
    out_channels: int = 8
    num_blocks: int = 24
    num_heads: Optional[int] = 16
    mlp_ratio: float = 4.0
    patch_size: int = 2
    num_io_res_blocks: int = 2
    io_block_channels: Sequence[int] = (128,)
    pe_mode: str = "ape"
    use_skip_connection: bool = True
    share_mod: bool = False
    qk_rms_norm: bool = False
    qk_rms_norm_cross: bool = False
    remat_blocks: int = 0
    # Compact the padded capacity before the transformer torso: a 2x
    # downsample leaves ~1/8 of slots valid, and full attention pays
    # (capacity/valid)^2 on the padding. None = no compaction.
    torso_capacity: Optional[int] = None
    # measurement-only (benchmarks/slat_profile.py): {"self","cross","mlp"}
    # forward to every torso block; "torso" skips all torso blocks; "io"
    # skips the non-resampling io res blocks (down/upsample blocks must stay
    # for structure bookkeeping); "down_conv"/"up_conv" skip the conv bodies
    # of the resampling blocks; "pe" skips the position embedding.
    ablate: tuple = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels, t: jnp.ndarray, cond: jnp.ndarray) -> SparseVoxels:
        from ...sparse.ops import sparse_compact, sparse_scatter_back

        C = self.model_channels
        h = SparseLinear(self.io_block_channels[0], dtype=self.dtype,
                         name="input_layer")(x)
        t_emb = TimestepEmbedder(C, name="t_embedder")(t)
        mod = t_emb
        if self.share_mod:
            mod = nn.Dense(
                6 * C, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, name="adaLN_modulation",
            )(nn.silu(t_emb))

        skips: List[jnp.ndarray] = []
        structures: List[Tuple[SparseVoxels, jnp.ndarray]] = []
        io_chs = list(self.io_block_channels)
        bi = 0
        for chs, next_chs in zip(io_chs, io_chs[1:] + [C]):
            for _ in range(self.num_io_res_blocks - 1):
                if "io" not in self.ablate:
                    h, _ = SparseResBlock3d(
                        chs, C, out_channels=chs, dtype=self.dtype,
                        name=f"input_blocks_{bi}",
                    )(h, t_emb)
                skips.append(h.feats)
                bi += 1
            h, ds = SparseResBlock3d(
                chs, C, out_channels=next_chs, downsample=True, dtype=self.dtype,
                # compact at the last (deepest) downsample so both its conv
                # body and the torso run at torso_capacity, not the input
                # padding (the old post-loop compaction paid full-capacity
                # 1024-ch convs first)
                compact_to=self.torso_capacity if next_chs == C else None,
                ablate_conv="down_conv" in self.ablate,
                name=f"input_blocks_{bi}",
            )(h, t_emb)
            structures.append(ds)
            skips.append(h.feats)
            bi += 1

        torso_template, torso_slots = None, None
        if self.torso_capacity is not None and self.torso_capacity < h.capacity:
            torso_template = h
            h, torso_slots = sparse_compact(h, self.torso_capacity)

        if self.pe_mode == "ape" and "pe" not in self.ablate:
            pe = AbsolutePositionEmbedder(C, name="pos_embedder")(
                h.coords.astype(jnp.float32)
            )
            h = h + pe * h.valid[..., None]

        RematBlock = nn.remat(ModulatedSparseCrossBlock)
        for i in range(self.num_blocks if "torso" not in self.ablate else 0):
            Block = RematBlock if i < self.remat_blocks else ModulatedSparseCrossBlock
            h = Block(
                channels=C, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qk_rms_norm=self.qk_rms_norm,
                qk_rms_norm_cross=self.qk_rms_norm_cross,
                share_mod=self.share_mod, dtype=self.dtype, name=f"blocks_{i}",
                ablate=tuple(a for a in self.ablate if a != "io"),
            )(h, mod, cond)

        if torso_template is not None:
            h = sparse_scatter_back(h, torso_slots, torso_template)

        bo = 0
        rev_skips = list(reversed(skips))
        si = 0
        for chs, prev_chs in zip(
            reversed(io_chs), [C] + list(reversed(io_chs[1:]))
        ):
            # upsample block (pops the paired downsample structure)
            if self.use_skip_connection:
                h = h.replace(feats=jnp.concatenate([h.feats, rev_skips[si]], -1))
            si += 1
            h, _ = SparseResBlock3d(
                prev_chs * 2 if self.use_skip_connection else prev_chs,
                C, out_channels=chs, upsample=True, dtype=self.dtype,
                ablate_conv="up_conv" in self.ablate,
                name=f"out_blocks_{bo}",
            )(h, t_emb, up_structure=structures.pop())
            bo += 1
            for _ in range(self.num_io_res_blocks - 1):
                if "io" not in self.ablate:
                    if self.use_skip_connection:
                        h = h.replace(
                            feats=jnp.concatenate([h.feats, rev_skips[si]], -1))
                    h, _ = SparseResBlock3d(
                        chs * 2 if self.use_skip_connection else chs,
                        C, out_channels=chs, dtype=self.dtype,
                        name=f"out_blocks_{bo}",
                    )(h, t_emb)
                si += 1
                bo += 1

        h = SparseLayerNorm(affine=False, name="out_norm")(h)
        return SparseLinear(
            self.out_channels, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="out_layer",
        )(h)
