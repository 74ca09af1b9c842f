"""SparseVoxels: static-shape sparse-voxel tensor for TPU.

Re-designs the reference's SparseTensor (sparse/basic.py:18-463: COO feats
[T,C] + coords [T,4] with ragged per-batch layout slices) as a per-batch
PADDED pytree:

    feats  [B, L, C]   voxel features (zeros where invalid)
    coords [B, L, 3]   int32 voxel coordinates in [0, resolution)
    valid  [B, L]      bool occupancy mask

L is a static capacity (pad to a bucket to bound recompiles). XLA wants static
shapes; the ragged layout bookkeeping (`__cal_layout`, spatial caches,
batch-broadcast helpers of the reference) collapses into plain masked array
ops, vmappable and shardable over B. The reference's three duplicated sparse
packages (SURVEY.md §1 duplication warning) become this one module family.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class SparseVoxels:
    feats: jnp.ndarray   # [B, L, C] float
    coords: jnp.ndarray  # [B, L, 3] int32
    valid: jnp.ndarray   # [B, L] bool
    resolution: int = flax.struct.field(pytree_node=False, default=64)

    # -- shape helpers ------------------------------------------------------

    @property
    def batch_size(self) -> int:
        return self.feats.shape[0]

    @property
    def capacity(self) -> int:
        return self.feats.shape[1]

    @property
    def channels(self) -> int:
        return self.feats.shape[-1]

    def counts(self) -> jnp.ndarray:
        return jnp.sum(self.valid, axis=1)

    # -- functional updates --------------------------------------------------

    def replace_feats(self, feats: jnp.ndarray) -> "SparseVoxels":
        """New features on the same structure (reference SparseTensor.replace,
        sparse/basic.py:244)."""
        return self.replace(feats=feats * self.valid[..., None].astype(feats.dtype))

    def map_feats(self, fn: Callable) -> "SparseVoxels":
        return self.replace_feats(fn(self.feats))

    # -- arithmetic broadcast (reference __elemwise__, sparse/basic.py:309) --

    def _elemwise(self, other, op):
        if isinstance(other, SparseVoxels):
            other = other.feats
        other = jnp.asarray(other)
        if other.ndim == 2 and other.shape[0] == self.batch_size:
            # per-batch broadcast [B, C] -> [B, 1, C]
            other = other[:, None, :]
        return self.replace_feats(op(self.feats, other))

    def __add__(self, other):
        return self._elemwise(other, jnp.add)

    def __sub__(self, other):
        return self._elemwise(other, jnp.subtract)

    def __mul__(self, other):
        return self._elemwise(other, jnp.multiply)

    # -- dense interop -------------------------------------------------------

    def to_dense(self) -> jnp.ndarray:
        """[B, R, R, R, C] dense grid (invalid slots contribute nothing)."""
        r = self.resolution
        b, l, c = self.feats.shape
        flat_idx = (
            self.coords[..., 0] * r * r + self.coords[..., 1] * r + self.coords[..., 2]
        )
        flat_idx = jnp.where(self.valid, flat_idx, r * r * r)  # dump slot
        out = jnp.zeros((b, r * r * r + 1, c), self.feats.dtype)
        out = jax.vmap(lambda o, i, f: o.at[i].add(f))(out, flat_idx, self.feats)
        return out[:, :-1].reshape(b, r, r, r, c)

    def index_grid(self) -> jnp.ndarray:
        """[B, R^3] int32: slot index of the voxel at each dense cell, -1 if
        empty. The neighbor-lookup structure for sparse conv / upsampling."""
        r = self.resolution
        b, l = self.valid.shape
        flat_idx = (
            self.coords[..., 0] * r * r + self.coords[..., 1] * r + self.coords[..., 2]
        )
        flat_idx = jnp.where(self.valid, flat_idx, r * r * r)
        slots = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32), (b, l))
        grid = jnp.full((b, r * r * r + 1), -1, jnp.int32)
        grid = jax.vmap(lambda g, i, s: g.at[i].set(s))(grid, flat_idx, slots)
        return grid[:, :-1]


def from_dense(dense: jnp.ndarray, capacity: int, threshold: float = 0.0) -> SparseVoxels:
    """[B, R, R, R, C] -> SparseVoxels keeping cells with any |feat| > threshold.

    Host-friendly (uses top_k to fit static capacity; excess cells dropped by
    magnitude — callers should size `capacity` above expected occupancy).
    With GVF_DEBUG=1 an occupancy > capacity raises instead of silently
    dropping (a structure-generation bug upstream would otherwise pass
    unnoticed into SLat sampling).
    """
    b, r, _, _, c = dense.shape
    flat = dense.reshape(b, r * r * r, c)
    occ = jnp.max(jnp.abs(flat), axis=-1) > threshold
    from . import debug as _debug
    if _debug.DEBUG and not isinstance(occ, jax.core.Tracer):  # host-side only
        n_occ = int(jnp.max(jnp.sum(occ, axis=-1)))
        if n_occ > capacity:
            raise _debug.SparseInvariantError(
                f"from_dense overflow: {n_occ} occupied cells > capacity "
                f"{capacity} — excess would be silently dropped"
            )
    # order: occupied cells first (stable by linear index)
    score = occ.astype(jnp.int32)
    _, idx = jax.lax.top_k(score * (r * r * r) - jnp.arange(r * r * r), capacity)
    feats = jnp.take_along_axis(flat, idx[..., None], axis=1)
    valid = jnp.take_along_axis(occ, idx, axis=1)
    x = idx // (r * r)
    y = (idx // r) % r
    z = idx % r
    coords = jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
    feats = feats * valid[..., None]
    return SparseVoxels(feats=feats, coords=coords, valid=valid, resolution=r)


def from_lists(
    coords_list: Sequence[np.ndarray],
    feats_list: Sequence[np.ndarray],
    resolution: int,
    capacity: Optional[int] = None,
) -> SparseVoxels:
    """Build from per-sample [Ni,3] coords + [Ni,C] feats (host-side)."""
    b = len(coords_list)
    cap = capacity or max(len(c) for c in coords_list)
    c_dim = feats_list[0].shape[-1]
    feats = np.zeros((b, cap, c_dim), dtype=np.float32)
    coords = np.zeros((b, cap, 3), dtype=np.int32)
    valid = np.zeros((b, cap), dtype=bool)
    for i, (co, fe) in enumerate(zip(coords_list, feats_list)):
        n = min(len(co), cap)
        coords[i, :n] = np.asarray(co)[:n]
        feats[i, :n] = np.asarray(fe)[:n]
        valid[i, :n] = True
    return SparseVoxels(
        feats=jnp.asarray(feats), coords=jnp.asarray(coords),
        valid=jnp.asarray(valid), resolution=resolution,
    )
