"""DFS-ordered octree + trivec radiance-field representations.

Capability re-design of trellis/representations/octree/octree_dfs.py:21
(DfsOctree: flat DFS-layout arrays with structure control) and
trellis/representations/radiance_field/strivec.py:8 (Strivec = octree leaves
carrying TensoRF CP-decomposed features). Stored as static-shape pytrees:

    positions [N, 3]  leaf centers (normalized [0,1])
    depths    [N]     leaf depth (cell size = 1/2^depth)
    features  ...     per-leaf payload (density/color or trivec ranks)
    valid     [N]

Construction from a dense grid or from SparseVoxels; `subdivide`/`prune`
mirror the reference's structure control with static capacity.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class DfsOctree:
    positions: jnp.ndarray  # [N, 3]
    depths: jnp.ndarray     # [N] int32
    features: jnp.ndarray   # [N, C]
    valid: jnp.ndarray      # [N] bool
    max_depth: int = flax.struct.field(pytree_node=False, default=6)
    # static lower bound on any leaf's depth: lets leaf_index_grid skip the
    # shallow levels whose box-fill would materialize [N, span^3, 3] monsters
    # (at depth 1 of a 64^3 tree that is 6.4 GB — measured as seconds of
    # render time and OOMs). None = no bound (full loop).
    min_depth: Optional[int] = flax.struct.field(pytree_node=False, default=None)

    @property
    def capacity(self) -> int:
        return self.positions.shape[0]

    def cell_size(self) -> jnp.ndarray:
        return 1.0 / (2.0 ** self.depths.astype(jnp.float32))

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid)


def from_sparse_voxels(sv, features: Optional[jnp.ndarray] = None) -> DfsOctree:
    """All voxels become leaves at depth log2(resolution) (batch element 0)."""
    depth = int(np.log2(sv.resolution))
    pos = (sv.coords[0].astype(jnp.float32) + 0.5) / sv.resolution
    feats = features if features is not None else sv.feats[0]
    return DfsOctree(
        positions=pos,
        depths=jnp.full((sv.capacity,), depth, jnp.int32),
        features=feats,
        valid=sv.valid[0],
        max_depth=depth,
        min_depth=depth,  # uniform: the index grid needs ONE depth pass
    )


def subdivide(tree: DfsOctree, mask: jnp.ndarray) -> DfsOctree:
    """Split masked leaves into 8 children (capacity grows 8x; unmasked
    leaves keep one slot, their other 7 slots invalid) — the static-shape
    form of the reference's structure control."""
    n = tree.capacity
    offsets = jnp.asarray(
        [[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], jnp.float32
    ) - 0.5  # [-0.5, 0.5] pattern
    child_size = tree.cell_size()[:, None, None] / 2.0
    child_pos = tree.positions[:, None, :] + offsets[None] * child_size
    keep_pos = jnp.broadcast_to(tree.positions[:, None, :], child_pos.shape)
    pos = jnp.where(mask[:, None, None], child_pos, keep_pos).reshape(n * 8, 3)
    depths = jnp.where(mask, tree.depths + 1, tree.depths)
    depths = jnp.repeat(depths, 8)
    feats = jnp.repeat(tree.features, 8, axis=0)
    first_slot = (jnp.arange(n * 8) % 8) == 0
    valid = jnp.repeat(tree.valid, 8) & (jnp.repeat(mask, 8) | first_slot)
    return DfsOctree(
        positions=pos, depths=depths, features=feats, valid=valid,
        max_depth=tree.max_depth + 1,
        min_depth=tree.min_depth,  # unsplit leaves keep their depth
    )


def prune(tree: DfsOctree, mask: jnp.ndarray) -> DfsOctree:
    """Invalidate masked leaves (slots stay; capacity static)."""
    return tree.replace(valid=tree.valid & ~mask)


def sample_trivec(tv: jnp.ndarray, rel: jnp.ndarray) -> jnp.ndarray:
    """Linearly interpolate CP axis-vectors at in-cell coords.

    tv [P, rank, 3, dim] (dim samples spanning the cell, align_corners=True —
    the convention the reference's subdivision grid_sample uses,
    octree_dfs.py:322-326); rel [P, 3] in [0,1]. Returns the per-rank
    separable product vx*vy*vz [P, rank]."""
    dim = tv.shape[-1]
    pos = jnp.clip(rel, 0.0, 1.0) * (dim - 1)  # [P,3]
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, dim - 2)
    w = (pos - i0)[:, None, :]  # [P,1,3]
    idx0 = i0[:, None, :, None]  # [P,1,3,1]
    v0 = jnp.take_along_axis(tv, jnp.broadcast_to(idx0, tv.shape[:3] + (1,)), axis=3)[..., 0]
    v1 = jnp.take_along_axis(tv, jnp.broadcast_to(idx0 + 1, tv.shape[:3] + (1,)), axis=3)[..., 0]
    v = v0 * (1.0 - w) + v1 * w  # [P, rank, 3]
    return v[..., 0] * v[..., 1] * v[..., 2]


def sample_trivec_taps(tv: jnp.ndarray, leaf: jnp.ndarray,
                       rel: jnp.ndarray) -> jnp.ndarray:
    """sample_trivec evaluated by gathering ONLY the two interpolation taps
    per axis straight from the [N, rank, 3, dim] table (dim/2 x less gather
    traffic than fetching whole per-leaf tensors — the trivec renderer's
    dominant cost at millions of samples). leaf [P] int32 (>=0), rel [P, 3]
    in [0,1] -> per-rank separable products [P, rank]."""
    n, rank, _, dim = tv.shape
    flat = tv.reshape(-1)
    pos = jnp.clip(rel, 0.0, 1.0) * (dim - 1)          # [P, 3]
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, dim - 2)
    w = pos[:, None, :]                                 # [P, 1, 3]
    base = (
        leaf[:, None, None] * (rank * 3 * dim)
        + jnp.arange(rank, dtype=jnp.int32)[None, :, None] * (3 * dim)
        + jnp.arange(3, dtype=jnp.int32)[None, None, :] * dim
    )                                                   # [P, rank, 3]
    lin0 = base + i0[:, None, :]
    v0 = flat[lin0]
    v1 = flat[lin0 + 1]
    frac = w - i0[:, None, :]
    v = v0 * (1.0 - frac) + v1 * frac                   # [P, rank, 3]
    return v[..., 0] * v[..., 1] * v[..., 2]


def leaf_index_grid(tree: DfsOctree) -> jnp.ndarray:
    """Dense [R, R, R] int32 grid mapping finest-resolution cells to leaf
    ids (-1 = empty), R = 2^max_depth. O(1) point->leaf lookup for the
    renderer — the TPU replacement for the reference rasterizers' DFS
    descent (diffoctreerast walks the structure array per ray). Leaves
    coarser than max_depth fill their whole 2^(max_depth-depth)-cell box;
    that fill is bounded by a static unroll over depths, so the builder
    stays jittable for mixed-depth trees up to max_depth<=8."""
    r = 2 ** tree.max_depth
    n = tree.capacity
    grid = jnp.full((r * r * r,), -1, jnp.int32)
    base = jnp.clip((tree.positions * r).astype(jnp.int32), 0, r - 1)
    ids = jnp.arange(n, dtype=jnp.int32)
    lo = tree.min_depth if tree.min_depth is not None else 1
    for depth in range(tree.max_depth, lo - 1, -1):
        span = 2 ** (tree.max_depth - depth)
        sel = tree.valid & (tree.depths == depth)
        anchor = (base // span) * span
        offs = jnp.stack(
            jnp.meshgrid(*([jnp.arange(span)] * 3), indexing="ij"), -1
        ).reshape(-1, 3)  # [span^3, 3]
        cells = anchor[:, None, :] + offs[None]  # [N, span^3, 3]
        lin = (cells[..., 0] * r + cells[..., 1]) * r + cells[..., 2]
        lin = jnp.where(sel[:, None], lin, r * r * r)  # OOB drop for invalid
        grid = grid.at[lin.reshape(-1)].set(
            jnp.broadcast_to(ids[:, None], lin.shape).reshape(-1),
            mode="drop",
        )
    return grid.reshape(r, r, r)


def lookup_leaf(grid: jnp.ndarray, points: jnp.ndarray):
    """points [P,3] in [0,1] -> (leaf ids [P] int32 with -1 miss,
    in-cell coords [P,3] in [0,1] at the grid's FINEST resolution).

    NOTE: for mixed-depth trees the returned rel is finest-cell-local, not
    leaf-local — field evaluation should use lookup_leaf_local, which spans
    each leaf's actual cell (they agree on uniform max_depth trees)."""
    r = grid.shape[0]
    scaled = points * r
    cell = jnp.clip(jnp.floor(scaled).astype(jnp.int32), 0, r - 1)
    inside = jnp.all((points >= 0.0) & (points < 1.0), axis=-1)
    # flat linear gather: multi-dimensional advanced indexing lowers to a
    # much slower multi-index gather on TPU
    lin = (cell[:, 0] * r + cell[:, 1]) * r + cell[:, 2]
    leaf = grid.reshape(-1)[lin]
    leaf = jnp.where(inside, leaf, -1)
    rel = jnp.clip(scaled - cell, 0.0, 1.0)
    return leaf, rel


def lookup_leaf_local(grid: jnp.ndarray, tree: DfsOctree, points: jnp.ndarray):
    """O(1) leaf lookup returning LEAF-local coordinates.

    For mixed-depth trees a leaf coarser than max_depth spans
    2^(max_depth-depth) finest cells; its primitive must be evaluated once
    over the whole leaf (the reference rasterizers sample leaf-locally),
    not tiled per finest cell. Returns (leaf ids [P] with -1 miss,
    leaf-local coords [P,3] in [0,1], leaf resolution [P] = 2^depth cells
    per unit length — the correct density scale: per-cell opacity converts
    to per-unit sigma via the leaf's OWN cell size)."""
    leaf, _ = lookup_leaf(grid, points)
    safe = jnp.maximum(leaf, 0)
    res = 2.0 ** tree.depths[safe].astype(jnp.float32)
    corner = tree.positions[safe] - 0.5 / res[:, None]
    rel = jnp.clip((points - corner) * res[:, None], 0.0, 1.0)
    return leaf, rel, res


@flax.struct.dataclass
class VoxelOctree:
    """Leaves carrying constant density + SH color (the reference's
    OctreeVoxelRasterizer payload, octree_dfs.py:81-89: features_dc/ac
    [+ density unless solid])."""

    tree: DfsOctree
    density: jnp.ndarray      # [N] raw; activation exp(x - 2)
    colors_dc: jnp.ndarray    # [N, 3]
    colors_ac: Optional[jnp.ndarray] = None  # [N, S-1, 3] higher SH bands
    solid: bool = flax.struct.field(pytree_node=False, default=False)


@flax.struct.dataclass
class GaussianOctree:
    """Leaves as isotropic gaussian blobs (OctreeGaussianRasterizer payload,
    octree_dfs.py:90-95: opacity raw -> sigmoid(x - 6))."""

    tree: DfsOctree
    opacity: jnp.ndarray      # [N] raw
    colors_dc: jnp.ndarray    # [N, 3]
    colors_ac: Optional[jnp.ndarray] = None


@flax.struct.dataclass
class DecoupolyOctree:
    """Leaves carrying rank decoupled-polynomial fields (the reference's
    OctreeDecoupolyRasterizer payload, octree_dfs.py:104-112): per rank a
    direction V [3] (normalized at eval, octree_dfs.py:162) and polynomial
    coefficients g [degree] evaluated at t = <V, local coords in [-1,1]>."""

    tree: DfsOctree
    V: jnp.ndarray            # [N, rank, 3]
    g: jnp.ndarray            # [N, rank, degree]
    density: jnp.ndarray      # [N, rank] raw; activation exp(x - 2)
    colors: jnp.ndarray       # [N, rank, 3]
    density_shift: float = flax.struct.field(pytree_node=False, default=0.0)


@flax.struct.dataclass
class Strivec:
    """Octree leaves + CP-decomposed (trivec) features: per leaf, `rank`
    triplets of 1-D vectors along x/y/z whose outer-product sum is the
    local feature volume (reference strivec.py:8 over TensoRF CP)."""

    tree: DfsOctree
    trivec: jnp.ndarray   # [N, rank, 3, dim]
    density: jnp.ndarray  # [N, rank]
    colors: jnp.ndarray   # [N, rank, 3]

    density_shift: float = flax.struct.field(pytree_node=False, default=0.0)

    def density_at(self, points: jnp.ndarray) -> jnp.ndarray:
        """Evaluate CP density at world points [P, 3] (nearest leaf)."""
        # nearest leaf by L-inf distance scaled by cell size
        d = jnp.abs(points[:, None, :] - self.tree.positions[None])  # [P,N,3]
        half = self.tree.cell_size()[None, :, None] / 2.0
        inside = jnp.all(d <= half + 1e-6, axis=-1) & self.tree.valid[None]
        leaf = jnp.argmax(inside, axis=1)  # [P]
        hit = jnp.any(inside, axis=1)

        rel = (points - self.tree.positions[leaf]) / jnp.maximum(
            self.tree.cell_size()[leaf][:, None], 1e-6
        ) + 0.5  # [0,1] in-leaf coords
        dim = self.trivec.shape[-1]
        idx = jnp.clip((rel * dim).astype(jnp.int32), 0, dim - 1)  # [P, 3]
        tv = self.trivec[leaf]  # [P, rank, 3, dim]
        vx = jnp.take_along_axis(tv[:, :, 0], idx[:, None, 0:1], axis=2)[..., 0]
        vy = jnp.take_along_axis(tv[:, :, 1], idx[:, None, 1:2], axis=2)[..., 0]
        vz = jnp.take_along_axis(tv[:, :, 2], idx[:, None, 2:3], axis=2)[..., 0]
        dens = jnp.sum(self.density[leaf] * vx * vy * vz, axis=-1)
        return jnp.where(hit, jax.nn.relu(dens), 0.0)
