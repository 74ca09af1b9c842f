"""Sparse spatial + pointwise ops on SparseVoxels.

Replaces the reference's sparse/linear.py, sparse/norm.py,
sparse/nonlinearity.py, sparse/spatial.py:13-110 (SparseDownsample/Upsample/
Subdivide) with masked static-shape equivalents. Pooling uses sort-based
dedup (O(L log L), no dense grids), producing the child->parent map that
upsampling reuses — mirroring the reference's cached-permutation design.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .tensor import SparseVoxels


# -- pointwise ---------------------------------------------------------------


class SparseLinear(nn.Module):
    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels) -> SparseVoxels:
        f = nn.Dense(
            self.features, use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=self.kernel_init, bias_init=self.bias_init,
        )(x.feats)
        return x.replace_feats(f)


class SparseLayerNorm(nn.Module):
    """Per-voxel LayerNorm over channels (mask-independent)."""

    epsilon: float = 1e-6
    affine: bool = True

    @nn.compact
    def __call__(self, x: SparseVoxels) -> SparseVoxels:
        f = nn.LayerNorm(
            epsilon=self.epsilon, use_bias=self.affine, use_scale=self.affine,
            dtype=jnp.float32,
        )(x.feats)
        return x.replace_feats(f)


class SparseGroupNorm(nn.Module):
    """GroupNorm with statistics over (group channels x valid voxels) per
    batch element — matching torch GroupNorm applied per-sample to [C, T_b]
    (reference sparse/norm.py:12-27's per-batch loop)."""

    num_groups: int
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: SparseVoxels) -> SparseVoxels:
        b, l, c = x.feats.shape
        g = self.num_groups
        f = x.feats.reshape(b, l, g, c // g).astype(jnp.float32)
        m = x.valid[:, :, None, None].astype(jnp.float32)
        n = jnp.sum(m, axis=1, keepdims=True) * (c // g) + 1e-6
        mean = jnp.sum(f * m, axis=(1, 3), keepdims=True) / n[..., :1]
        var = jnp.sum(((f - mean) ** 2) * m, axis=(1, 3), keepdims=True) / n[..., :1]
        f = (f - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        out = f.reshape(b, l, c) * scale + bias
        return x.replace_feats(out.astype(x.feats.dtype))


def sparse_silu(x: SparseVoxels) -> SparseVoxels:
    return x.map_feats(jax.nn.silu)


def sparse_gelu(x: SparseVoxels) -> SparseVoxels:
    return x.map_feats(lambda f: jax.nn.gelu(f, approximate=True))


def sparse_relu(x: SparseVoxels) -> SparseVoxels:
    return x.map_feats(jax.nn.relu)


# -- pooling -----------------------------------------------------------------


class DownsampleResult(NamedTuple):
    parents: SparseVoxels
    child_to_parent: jnp.ndarray  # [B, L] int32 parent slot per child (-1 pad)


def _flat(coords, res):
    return coords[..., 0] * res * res + coords[..., 1] * res + coords[..., 2]


def sparse_downsample(x: SparseVoxels, factor: int = 2) -> DownsampleResult:
    """Pool voxels into coords//factor cells (reference sparse/spatial.py:13).

    CHECKPOINT-COMPAT QUIRK: the reference's "average pooling" uses
    torch.scatter_reduce(zeros, reduce='mean') with the default
    include_self=True, so the zero initial element joins the mean — each
    parent gets sum/(n_children + 1), NOT a true mean (verified against the
    reference on CPU). Released SLat-flow weights were trained with this
    scaling, so we reproduce it exactly.

    Sort-based dedup: children sorted by parent code; run starts delimit
    parents; segment_sum pools. Parent tensor reuses capacity L.
    """
    b, l, c = x.feats.shape
    new_res = x.resolution // factor
    pcoords = x.coords // factor
    pflat = jnp.where(x.valid, _flat(pcoords, new_res), new_res**3)  # pad key

    def per_batch(pflat_b, feats_b, valid_b):
        order = jnp.argsort(pflat_b)
        sorted_key = pflat_b[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]]
        )
        seg = jnp.cumsum(first) - 1  # parent slot per sorted child
        pooled = jax.ops.segment_sum(feats_b[order], seg, num_segments=l)
        cnt = jax.ops.segment_sum(
            valid_b[order].astype(feats_b.dtype), seg, num_segments=l
        )
        mean = pooled / (cnt + 1.0)[:, None]  # +1: include_self zero (above)
        # parent coords: from the first child of each run
        pkey = jax.ops.segment_max(sorted_key, seg, num_segments=l)
        pvalid = cnt > 0
        pvalid = jnp.logical_and(pvalid, pkey < new_res**3)
        px = pkey // (new_res * new_res)
        py = (pkey // new_res) % new_res
        pz = pkey % new_res
        pc = jnp.stack([px, py, pz], -1).astype(jnp.int32)
        pc = jnp.where(pvalid[:, None], pc, 0)
        # child -> parent slot (in original child order)
        c2p = jnp.zeros((l,), jnp.int32).at[order].set(seg.astype(jnp.int32))
        c2p = jnp.where(valid_b, c2p, -1)
        return mean * pvalid[:, None], pc, pvalid, c2p

    mean, pc, pvalid, c2p = jax.vmap(per_batch)(pflat, x.feats, x.valid)
    parents = SparseVoxels(feats=mean, coords=pc, valid=pvalid, resolution=new_res)
    return DownsampleResult(parents, c2p)


def sparse_upsample(
    parents: SparseVoxels, child_template: SparseVoxels, child_to_parent: jnp.ndarray
) -> SparseVoxels:
    """Nearest-neighbor unpool back onto the cached child structure
    (reference sparse/spatial.py:59-82 uses the cached downsample idx).
    Children with child_to_parent < 0 (invalid, or parent dropped by a
    capacity-bounded compaction) produce zeros."""
    idx = jnp.maximum(child_to_parent, 0)
    f = jnp.take_along_axis(parents.feats, idx[..., None], axis=1)
    keep = jnp.logical_and(child_template.valid, child_to_parent >= 0)
    f = f * keep[..., None].astype(f.dtype)
    return child_template.replace(feats=f)


def sparse_subdivide(x: SparseVoxels) -> SparseVoxels:
    """Octree 2x subdivision: each voxel becomes 8 children with copied feats
    (reference sparse/spatial.py:84-110). Capacity grows 8x."""
    b, l, c = x.feats.shape
    offsets = jnp.array(
        [[i, j, k] for i in range(2) for j in range(2) for k in range(2)],
        jnp.int32,
    )  # [8,3]
    coords = (x.coords[:, :, None, :] * 2 + offsets).reshape(b, l * 8, 3)
    feats = jnp.repeat(x.feats, 8, axis=1)
    valid = jnp.repeat(x.valid, 8, axis=1)
    return SparseVoxels(
        feats=feats, coords=coords, valid=valid, resolution=x.resolution * 2
    )


def sparse_compact(x: SparseVoxels, new_capacity: int):
    """Pack valid voxels to the front and shrink the padded capacity.

    After a 2x downsample the parent set has ~1/8 the voxels but the padded
    capacity L is unchanged, so full attention in a downstream torso pays
    (L/valid)^2 extra work. Compaction is a static-shape gather: valid slots
    first (stable order), truncated to `new_capacity`.

    Returns (compacted SparseVoxels, slots [B, new_capacity] int32 source
    indices, -1 where padding). Voxels beyond `new_capacity` valid entries are
    dropped — pick the capacity from the workload's occupancy budget.
    """
    b, l, _ = x.feats.shape
    assert new_capacity <= l
    key = jnp.where(x.valid, 0, 1).astype(jnp.int32)
    order = jnp.argsort(key, axis=1, stable=True)[:, :new_capacity]  # [B, nc]
    valid = jnp.take_along_axis(x.valid, order, axis=1)
    feats = jnp.take_along_axis(x.feats, order[..., None], axis=1)
    coords = jnp.take_along_axis(x.coords, order[..., None], axis=1)
    slots = jnp.where(valid, order.astype(jnp.int32), -1)
    out = SparseVoxels(
        feats=feats * valid[..., None].astype(feats.dtype),
        coords=jnp.where(valid[..., None], coords, 0),
        valid=valid,
        resolution=x.resolution,
    )
    return out, slots


def sparse_scatter_back(
    y: SparseVoxels, slots: jnp.ndarray, template: SparseVoxels
) -> SparseVoxels:
    """Inverse of sparse_compact: place y's features back onto the original
    (pre-compaction) structure; slots are the gather indices it returned."""
    b, l, _ = template.feats.shape
    feats = jnp.zeros(template.feats.shape[:2] + (y.channels,), y.feats.dtype)
    idx = jnp.maximum(slots, 0)
    src = y.feats * (slots >= 0)[..., None].astype(y.feats.dtype)
    feats = jax.vmap(lambda f, i, s: f.at[i].add(s))(feats, idx, src)
    return template.replace(feats=feats * template.valid[..., None].astype(feats.dtype))
