"""Submanifold sparse 3-D convolution — gather + matmul + accumulate.

TPU-native replacement for spconv's SubMConv3d (reference
sparse/conv/conv_spconv.py:6-44). Strategy (SURVEY.md §2.4): build a dense
[R^3] slot-index grid per sample ONCE (int32, ~1 MB at 64^3), then for each of
the K^3 kernel offsets gather the neighbor's features and hit the MXU with an
[L, C_in] x [C_in, C_out] matmul. Output exists only at input voxels
(submanifold), so structure is unchanged — no layout cache machinery needed.

Cost: K^3 gathers + K^3 MXU matmuls; XLA fuses the accumulation chain.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .tensor import SparseVoxels


def _neighbor_slots(x: SparseVoxels, grid: jnp.ndarray, offset) -> jnp.ndarray:
    """Slot index of coords+offset per voxel ([B, L], -1 if absent)."""
    r = x.resolution
    nc = x.coords + jnp.asarray(offset, jnp.int32)
    inb = jnp.all((nc >= 0) & (nc < r), axis=-1) & x.valid
    flat = jnp.clip(nc[..., 0] * r * r + nc[..., 1] * r + nc[..., 2], 0, r**3 - 1)
    slot = jnp.take_along_axis(grid, flat, axis=1)
    return jnp.where(inb, slot, -1)


def gather_neighbors(x: SparseVoxels, offset) -> jnp.ndarray:
    """Features of the voxel at coords+offset for every voxel: [B, L, C]
    (zeros where the neighbor doesn't exist)."""
    slot = _neighbor_slots(x, x.index_grid(), offset)
    f = jnp.take_along_axis(x.feats, jnp.maximum(slot, 0)[..., None], axis=1)
    return f * (slot >= 0)[..., None].astype(f.dtype)


class SparseConv3d(nn.Module):
    """kernel_size^3 submanifold conv. Weight layout [K^3, C_in, C_out]."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels, parent: SparseVoxels | None = None,
                 c2p: jnp.ndarray | None = None) -> SparseVoxels:
        """Standard call: conv over x's features.

        Fused-upsample call (parent + c2p given): x is the CHILD structure
        whose features are an upsample-gather of `parent` (every child
        duplicates its parent's feature vector). Exploits that to run the
        k^3 weight projections at PARENT count (project-then-gather):
          out[c] = sum_k W[k] . parent_feat[c2p[slot(c+k)]] * exists(c+k)
        — 4x fewer matmul FLOPs and 8x narrower gathers at the SLat-flow
        up-block shapes (conv1 1024->128 measured 8.7 -> see BENCH_NOTES).
        Numerically exact vs conv(upsample(parent))."""
        k = self.kernel_size
        c_in = parent.channels if parent is not None else x.channels
        n_off = k * k * k
        offsets = [
            (i - k // 2, j - k // 2, l - k // 2)
            for i in range(k) for j in range(k) for l in range(k)
        ]
        w = self.param(
            "kernel", self.kernel_init, (n_off, c_in, self.features)
        ).astype(self.dtype)

        if parent is not None:
            assert c2p is not None
            # z[k] = parent @ W[k] at parent count: ONE batched MXU matmul
            z = jnp.einsum(
                "bpc,kcf->bkpf", parent.feats.astype(self.dtype), w,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)                      # [B, K^3, P, F]
            grid = x.index_grid()
            out = jnp.zeros(x.feats.shape[:2] + (self.features,), jnp.float32)
            for oi, off in enumerate(offsets):
                if off == (0, 0, 0):
                    slot = jnp.where(x.valid, jnp.arange(x.capacity)[None], -1)
                else:
                    slot = _neighbor_slots(x, grid, off)
                pslot = jnp.take_along_axis(
                    c2p, jnp.maximum(slot, 0), axis=1)
                ok = (slot >= 0) & (pslot >= 0)
                g = jnp.take_along_axis(
                    z[:, oi], jnp.maximum(pslot, 0)[..., None], axis=1)
                out = out + g * ok[..., None].astype(g.dtype)
            out = out.astype(self.dtype)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.features,))
                out = out + bias.astype(self.dtype)
            return x.replace_feats(out)

        # NOTE: batching the K^3 gathers into one [B, L, K^3, C] tensor fed
        # to a single [L, K^3*C] x [K^3*C, F] einsum was MEASURED SLOWER
        # (SLat io-blocks 85 -> 132 ms/call): the big gather materializes a
        # 27x-features tensor to HBM that the loop form never does — XLA
        # fuses each per-offset gather straight into its matmul. Keep the
        # loop.
        grid = x.index_grid()  # one dense index build for all offsets
        out = jnp.zeros(x.feats.shape[:2] + (self.features,), jnp.float32)
        for oi, off in enumerate(offsets):
            if off == (0, 0, 0):
                nf = x.feats.astype(self.dtype)
            else:
                slot = _neighbor_slots(x, grid, off)
                nf = jnp.take_along_axis(
                    x.feats, jnp.maximum(slot, 0)[..., None], axis=1
                )
                nf = (nf * (slot >= 0)[..., None].astype(nf.dtype)).astype(self.dtype)
            out = out + jnp.einsum(
                "blc,cf->blf", nf, w[oi], preferred_element_type=jnp.float32
            )
        out = out.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(self.dtype)
        return x.replace_feats(out)


class SparseStridedConv3d(nn.Module):
    """Strided (non-submanifold) sparse conv (reference
    sparse/conv/conv_spconv.py:14 wrapping spconv.SparseConv3d, used by the
    SLat-flow io-blocks to move between 64^3 and 32^3 structures).

    TPU-native contract: the output structure is the deduplicated parent set
    coords//stride (static [B, L] capacity, like sparse_downsample); features
    at parent o are the full k^3 strided window sum_kof W[kof] . in[o*s +
    kof - pad]. The reference caches a backward permutation so
    SparseInverseConv3d can restore spconv's original order
    (conv_spconv.py:24-44); with padded static layouts no permutation is
    needed — the inverse takes the pre-stride structure explicitly.
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels) -> SparseVoxels:
        from .ops import sparse_downsample

        k, s, p = self.kernel_size, self.stride, self.padding
        c_in = x.channels
        parents = sparse_downsample(x, s).parents
        offsets = [(i, j, l) for i in range(k) for j in range(k) for l in range(k)]
        w = self.param(
            "kernel", self.kernel_init, (len(offsets), c_in, self.features)
        ).astype(self.dtype)
        grid = x.index_grid()
        r = x.resolution
        out = jnp.zeros(parents.feats.shape[:2] + (self.features,), jnp.float32)
        for oi, off in enumerate(offsets):
            nc = parents.coords * s + jnp.asarray(off, jnp.int32) - p
            inb = jnp.all((nc >= 0) & (nc < r), axis=-1) & parents.valid
            flat = jnp.clip(nc[..., 0] * r * r + nc[..., 1] * r + nc[..., 2], 0, r**3 - 1)
            slot = jnp.take_along_axis(grid, flat, axis=1)
            slot = jnp.where(inb, slot, -1)
            nf = jnp.take_along_axis(x.feats, jnp.maximum(slot, 0)[..., None], axis=1)
            nf = (nf * (slot >= 0)[..., None].astype(nf.dtype)).astype(self.dtype)
            out = out + jnp.einsum(
                "blc,cf->blf", nf, w[oi], preferred_element_type=jnp.float32
            )
        out = out.astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b.astype(self.dtype)
        return parents.replace_feats(out)


class SparseInverseConv3d(nn.Module):
    """Inverse (transposed) strided sparse conv (reference
    sparse/conv/conv_spconv.py:47-76 wrapping spconv.SparseInverseConv3d).

    Scatters low-res features back onto an explicit pre-stride structure:
    out[i] = sum over kof with (i + pad - kof) % s == 0 of
    W[kof] . y[(i + pad - kof) // s]. The reference recovers spconv's cached
    ordering via the stored permutation; here the caller passes `target`
    (the SparseVoxels whose structure the paired strided conv consumed).
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: SparseVoxels, target: SparseVoxels) -> SparseVoxels:
        k, s, p = self.kernel_size, self.stride, self.padding
        c_in = y.channels
        offsets = [(i, j, l) for i in range(k) for j in range(k) for l in range(k)]
        w = self.param(
            "kernel", self.kernel_init, (len(offsets), c_in, self.features)
        ).astype(self.dtype)
        grid = y.index_grid()
        r_low = y.resolution
        out = jnp.zeros(target.feats.shape[:2] + (self.features,), jnp.float32)
        for oi, off in enumerate(offsets):
            num = target.coords + p - jnp.asarray(off, jnp.int32)
            divisible = jnp.all(num % s == 0, axis=-1)
            oc = num // s
            inb = jnp.all((oc >= 0) & (oc < r_low), axis=-1)
            ok = divisible & inb & target.valid
            flat = jnp.clip(
                oc[..., 0] * r_low * r_low + oc[..., 1] * r_low + oc[..., 2],
                0, r_low**3 - 1,
            )
            slot = jnp.take_along_axis(grid, flat, axis=1)
            slot = jnp.where(ok, slot, -1)
            nf = jnp.take_along_axis(y.feats, jnp.maximum(slot, 0)[..., None], axis=1)
            nf = (nf * (slot >= 0)[..., None].astype(nf.dtype)).astype(self.dtype)
            out = out + jnp.einsum(
                "blc,cf->blf", nf, w[oi], preferred_element_type=jnp.float32
            )
        out = out.astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b.astype(self.dtype)
        return target.replace_feats(out)
