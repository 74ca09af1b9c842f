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
    )


def prune(tree: DfsOctree, mask: jnp.ndarray) -> DfsOctree:
    """Invalidate masked leaves (slots stay; capacity static)."""
    return tree.replace(valid=tree.valid & ~mask)


@flax.struct.dataclass
class Strivec:
    """Octree leaves + CP-decomposed (trivec) features: per leaf, `rank`
    triplets of 1-D vectors along x/y/z whose outer-product sum is the
    local feature volume (reference strivec.py:8 over TensoRF CP)."""

    tree: DfsOctree
    trivec: jnp.ndarray   # [N, rank, 3, dim]
    density: jnp.ndarray  # [N, rank]
    colors: jnp.ndarray   # [N, rank, 3]

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
