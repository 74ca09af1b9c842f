"""Debug invariant checks for the sparse runtime.

The reference gates shape/layout/contiguity asserts behind SPARSE_DEBUG=1
(sparse/__init__.py:14-23, sparse/basic.py:103-116, plus permutation
round-trip checks in each attention variant — SURVEY.md §4.3). Equivalent
here: `GVF_DEBUG=1` enables host-side validation of SparseVoxels invariants
and exact permutation round-trips for the windowed/serialized sorts.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

DEBUG = os.environ.get("GVF_DEBUG", "0") == "1"


class SparseInvariantError(AssertionError):
    pass


def check_sparse_voxels(x) -> None:
    """Validate a SparseVoxels (host-side; call outside jit)."""
    coords = np.asarray(x.coords)
    valid = np.asarray(x.valid)
    feats = np.asarray(x.feats)
    if coords.shape[:2] != valid.shape or feats.shape[:2] != valid.shape:
        raise SparseInvariantError(
            f"shape mismatch: coords {coords.shape}, feats {feats.shape}, "
            f"valid {valid.shape}"
        )
    if valid.any():
        cv = coords[valid]
        if cv.min() < 0 or cv.max() >= x.resolution:
            raise SparseInvariantError(
                f"coords out of range [0, {x.resolution}): "
                f"[{cv.min()}, {cv.max()}]"
            )
    # no duplicate coords among valid voxels of a sample
    for b in range(coords.shape[0]):
        cv = coords[b][valid[b]]
        key = (
            cv[:, 0].astype(np.int64) * x.resolution * x.resolution
            + cv[:, 1] * x.resolution + cv[:, 2]
        )
        if len(np.unique(key)) != len(key):
            raise SparseInvariantError(f"duplicate voxel coords in sample {b}")
    # padded features are zero
    if valid.size and (~valid).any():
        pad_mag = np.abs(feats[~valid]).max() if (~valid).sum() else 0.0
        if pad_mag > 1e-6:
            raise SparseInvariantError(
                f"non-zero features in padded slots (max {pad_mag})"
            )


def check_permutation_roundtrip(order, inv) -> None:
    """argsort(order) must invert order exactly (the reference checks the
    serialized permutation the same way, serialized_attn.py:188-190)."""
    o = np.asarray(order)
    i = np.asarray(inv)
    n = o.shape[-1]
    ident = np.broadcast_to(np.arange(n), o.shape)
    if not (np.take_along_axis(o, i, axis=-1) == ident).all():
        raise SparseInvariantError("permutation round-trip failed")


def maybe_check(x) -> None:
    if DEBUG:
        check_sparse_voxels(x)
