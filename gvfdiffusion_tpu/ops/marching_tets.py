"""Differentiable iso-surface extraction via marching tetrahedra.

Capability equivalent of the reference's FlexiCubes stack
(trellis/representations/mesh/flexicubes/flexicubes.py + cube2mesh.py:61
SparseFeatures2Mesh): turn per-voxel signed distances (+ optional vertex
deformations) into a triangle mesh. Marching tetrahedra (the DMTet kernel,
Shen et al. 2021 — public domain tables of 16 cases) is the TPU-idiomatic
choice: tiny static case tables, fixed 6-tets-per-cube decomposition, padded
static output (each tet emits 0..2 triangles -> capacity 2 per tet), and the
vertex positions are differentiable w.r.t. the SDF values.

Outputs are PADDED: (verts [M, 3], faces [F, 3], face_valid [F]) with
M = n_edges-ish static capacity; invalid faces reference vertex 0.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 6-tetrahedra decomposition of a cube (corner indices 0..7; corner i has
# offset bits (x=i&1, y=(i>>1)&1, z=(i>>2)&1))
TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 1, 7, 5],
        [0, 5, 7, 4],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
    ],
    np.int32,
)

CORNER_OFFSETS = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], np.int32
)

# the 6 edges of a tetrahedron as pairs of its 4 local vertices
TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32
)

# case table: for each of 16 sign configurations (bit i = vertex i inside),
# up to 2 triangles of edge indices (-1 = unused). Standard MT table.
MT_TRIS = np.array(
    [
        [-1, -1, -1, -1, -1, -1],
        [0, 2, 1, -1, -1, -1],
        [0, 3, 4, -1, -1, -1],
        [1, 3, 4, 1, 4, 2],
        [1, 5, 3, -1, -1, -1],
        [0, 2, 5, 0, 5, 3],
        [0, 1, 5, 0, 5, 4],
        [2, 5, 4, -1, -1, -1],
        [2, 4, 5, -1, -1, -1],
        [0, 4, 5, 0, 5, 1],
        [0, 5, 2, 0, 3, 5],
        [1, 3, 5, -1, -1, -1],
        [1, 4, 3, 1, 2, 4],
        [0, 4, 3, -1, -1, -1],
        [0, 1, 2, -1, -1, -1],
        [-1, -1, -1, -1, -1, -1],
    ],
    np.int32,
)


def marching_tets_dense(
    sdf: jnp.ndarray,          # [R+1, R+1, R+1] signed distances at grid corners
    deform: jnp.ndarray = None,  # optional [R+1, R+1, R+1, 3] vertex offsets
    grid_scale: float = 1.0,
    alpha: jnp.ndarray = None,   # optional [R+1, R+1, R+1] > 0 interp weights
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Extract the iso-surface of a dense SDF grid.

    `alpha` carries FlexiCubes' learned interpolation weights (Shen et al.
    2023 eq. 6, the reference's flexicubes.py `weight` channels predicted by
    SparseFeatures2Mesh): the edge crossing uses the reweighted field
    alpha*sdf, letting the network slide vertices along edges independently
    of the sign pattern. alpha=None (or all-ones) is plain marching tets.
    Positive alpha preserves signs, so topology stays that of `sdf`.

    Returns (verts [F*3, 3], faces [F, 3], face_valid [F]) — every face gets
    its own 3 unwelded vertices (static shapes; weld on host if needed).
    F = R^3 * 6 tets * 2 triangles.
    """
    r = sdf.shape[0] - 1
    corners = jnp.asarray(CORNER_OFFSETS)
    tets = jnp.asarray(TETS)
    tet_edges = jnp.asarray(TET_EDGES)
    tris_table = jnp.asarray(MT_TRIS)

    # cube base coords [C, 3]
    g = jnp.arange(r)
    base = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    n_cubes = base.shape[0]

    # per-cube corner positions + sdf [C, 8]
    cpos = base[:, None, :] + corners[None]  # [C, 8, 3]
    csdf = sdf[cpos[..., 0], cpos[..., 1], cpos[..., 2]]  # [C, 8]
    if deform is not None:
        cdef = deform[cpos[..., 0], cpos[..., 1], cpos[..., 2]]
    else:
        cdef = jnp.zeros(cpos.shape, sdf.dtype)
    cxyz = (cpos.astype(sdf.dtype) + cdef) * (grid_scale / r)
    if alpha is not None:
        calpha = alpha[cpos[..., 0], cpos[..., 1], cpos[..., 2]]  # [C, 8]
    else:
        calpha = jnp.ones_like(csdf)

    # per-tet vertices [C, 6, 4]
    tet_sdf = csdf[:, tets]            # [C, 6, 4]
    tet_xyz = cxyz[:, tets]            # [C, 6, 4, 3]
    tet_alpha = calpha[:, tets]        # [C, 6, 4]

    # case index per tet (sign pattern of the RAW sdf — alpha never flips it)
    inside = (tet_sdf < 0).astype(jnp.int32)
    case = (
        inside[..., 0] + 2 * inside[..., 1] + 4 * inside[..., 2]
        + 8 * inside[..., 3]
    )  # [C, 6]

    # edge interpolation points [C, 6, 6(edges), 3] on the reweighted field
    va = tet_xyz[:, :, tet_edges[:, 0]]
    vb = tet_xyz[:, :, tet_edges[:, 1]]
    sa = tet_sdf[:, :, tet_edges[:, 0]] * tet_alpha[:, :, tet_edges[:, 0]]
    sb = tet_sdf[:, :, tet_edges[:, 1]] * tet_alpha[:, :, tet_edges[:, 1]]
    denom = sa - sb
    t = sa / jnp.where(jnp.abs(denom) < 1e-10, 1e-10, denom)
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    edge_pts = va + t * (vb - va)  # [C, 6, 6, 3]

    # gather triangles from the case table [C, 6, 6(=2 tris x 3)]
    tri_edges = tris_table[case]  # [C, 6, 6]
    valid = tri_edges >= 0
    idx = jnp.maximum(tri_edges, 0)
    tri_pts = jax.vmap(
        jax.vmap(lambda pts, ii: pts[ii])
    )(edge_pts, idx)  # [C, 6, 6, 3]

    verts = tri_pts.reshape(-1, 3)                     # [C*6*6, 3]
    n_faces = n_cubes * 6 * 2
    faces = jnp.arange(n_faces * 3, dtype=jnp.int32).reshape(n_faces, 3)
    face_valid = valid.reshape(n_cubes, 6, 2, 3).all(-1).reshape(-1)
    verts = verts * face_valid.repeat(3)[:, None]
    return verts, faces, face_valid


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """[F, 3] unit normals (zero for degenerate faces)."""
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    n = jnp.cross(b - a, c - a)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return n / jnp.maximum(norm, 1e-10)


def weld_mesh(verts: np.ndarray, faces: np.ndarray, face_valid: np.ndarray,
              decimals: int = 6):
    """Host-side: drop invalid faces + merge duplicate vertices."""
    f = np.asarray(faces)[np.asarray(face_valid)]
    v = np.asarray(verts)
    used = v[f.reshape(-1)].round(decimals)
    uniq, inv = np.unique(used, axis=0, return_inverse=True)
    return uniq, inv.reshape(-1, 3)
