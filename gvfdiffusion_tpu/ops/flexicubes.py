"""FlexiCubes iso-surface extraction (Shen et al. 2023) — TPU-static design.

Carries the reference's full learned-weight scheme
(trellis/representations/mesh/flexicubes/flexicubes.py):

  - alpha [8/cube]:  per-corner field reweighting of the edge zero-crossings
    (flexicubes.py:249-263 `_linear_interp(s * alpha, x)`).
  - beta  [12/cube]: per-edge weights averaging the cube's crossing points
    into its DUAL VERTEX (flexicubes.py:310-313 `index_add(ue * beta)/sum`).
  - gamma [1/cube]:  quad-split weighting — inference picks the diagonal by
    comparing gamma products of opposite corners (flexicubes.py:356-364);
    training inserts a gamma-weighted center vertex and emits 4 triangles
    (flexicubes.py:365-380) so the split stays differentiable.

Weight normalization matches `_normalize_weights` (flexicubes.py:116-136):
beta/alpha = tanh(w)*0.99 + 1, gamma = sigmoid(w)*0.99 + 0.005.

Static-shape deviations from the reference (documented, by design):
  - ONE dual vertex per surface cube (classic dual contouring) instead of
    the dmc_table's up-to-4 per-cube grouping: multi-component cubes (rare
    ambiguous cases C16/C19 etc.) merge their sheets at one vertex instead
    of splitting; topology elsewhere is identical. Static shapes cannot
    carry the data-dependent per-case vertex counts without padding every
    cube to 4 vertices, which quadruples every buffer for <1% of cubes.
  - Outputs are PADDED: verts [R^3(+E), 3] one slot per cube (+ per edge in
    training mode), faces [F, 3] with face_valid. Invalid faces reference
    slot 0 with zeroed vertices; weld on host via marching_tets.weld_mesh.

Edge/corner conventions follow the reference exactly (corner bit i ->
offset (i&1, i>>1&1, i>>2&1); cube_edges order flexicubes.py:38) so the 21
weight channels of a converted SLat mesh-decoder checkpoint land on the
same edges.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CORNER_OFFSETS = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], np.int32
)

# the reference's cube_edges (flexicubes.py:38), 12 (a, b) corner pairs;
# beta channel e weights edge e in THIS order, alpha channels index corners
CUBE_EDGES = np.array(
    [
        [0, 1], [1, 5], [4, 5], [0, 4],
        [2, 3], [3, 7], [6, 7], [2, 6],
        [2, 0], [3, 1], [7, 5], [6, 4],
    ],
    np.int32,
)


def normalize_weights(weights: jnp.ndarray, weight_scale: float = 0.99):
    """Raw 21-channel cube weights -> (beta [.,12], alpha [.,8], gamma [.]),
    the reference's _normalize_weights ranges."""
    beta = jnp.tanh(weights[..., :12]) * weight_scale + 1.0
    alpha = jnp.tanh(weights[..., 12:20]) * weight_scale + 1.0
    gamma = (
        jax.nn.sigmoid(weights[..., 20]) * weight_scale
        + (1.0 - weight_scale) / 2.0
    )
    return beta, alpha, gamma


class FlexiMesh(NamedTuple):
    verts: jnp.ndarray       # [V, 3] padded (invalid slots zero)
    faces: jnp.ndarray       # [F, 3] int32 into verts
    face_valid: jnp.ndarray  # [F] bool
    l_dev: jnp.ndarray       # [] mean dual-vertex deviation (Eq. 8 analog)


def _quad_cubes(r: int):
    """For each interior grid edge (3 orientations), the 4 adjacent cube
    linear ids (x-major: id = x*R^2 + y*R + z) in cyclic order around the
    edge axis, plus the edge's two vertex grid coords. Host-side numpy —
    static tables baked into the jaxpr."""
    quads, va, vb = [], [], []
    rng = np.arange(r)

    def cube_id(x, y, z):
        return (x * r + y) * r + z

    # x-edges: vertex (i, j, k) -> (i+1, j, k); cubes vary over (j-1..j, k-1..k)
    i, j, k = np.meshgrid(rng, rng[1:], rng[1:], indexing="ij")
    i, j, k = i.ravel(), j.ravel(), k.ravel()
    quads.append(np.stack([
        cube_id(i, j - 1, k - 1), cube_id(i, j, k - 1),
        cube_id(i, j, k), cube_id(i, j - 1, k),
    ], -1))
    va.append(np.stack([i, j, k], -1))
    vb.append(np.stack([i + 1, j, k], -1))

    # y-edges: vertex (i, j, k) -> (i, j+1, k); cubes over (i-1..i, k-1..k)
    i, j, k = np.meshgrid(rng[1:], rng, rng[1:], indexing="ij")
    i, j, k = i.ravel(), j.ravel(), k.ravel()
    quads.append(np.stack([
        cube_id(i - 1, j, k - 1), cube_id(i - 1, j, k),
        cube_id(i, j, k), cube_id(i, j, k - 1),
    ], -1))
    va.append(np.stack([i, j, k], -1))
    vb.append(np.stack([i, j + 1, k], -1))

    # z-edges: vertex (i, j, k) -> (i, j, k+1); cubes over (i-1..i, j-1..j)
    i, j, k = np.meshgrid(rng[1:], rng[1:], rng, indexing="ij")
    i, j, k = i.ravel(), j.ravel(), k.ravel()
    quads.append(np.stack([
        cube_id(i - 1, j - 1, k), cube_id(i, j - 1, k),
        cube_id(i, j, k), cube_id(i - 1, j, k),
    ], -1))
    va.append(np.stack([i, j, k], -1))
    vb.append(np.stack([i, j, k + 1], -1))

    return (
        np.concatenate(quads, 0),
        np.concatenate(va, 0),
        np.concatenate(vb, 0),
    )


def flexicubes_dense(
    sdf: jnp.ndarray,                   # [R+1, R+1, R+1]
    deform: Optional[jnp.ndarray] = None,   # [R+1, R+1, R+1, 3]
    weights: Optional[jnp.ndarray] = None,  # [R, R, R, 21] RAW (see normalize)
    grid_scale: float = 1.0,
    training: bool = False,
) -> FlexiMesh:
    """Dual-vertex FlexiCubes extraction of a dense SDF grid."""
    r = sdf.shape[0] - 1
    n = r + 1
    dtype = sdf.dtype
    corners = jnp.asarray(CORNER_OFFSETS)
    edges = jnp.asarray(CUBE_EDGES)

    if weights is not None:
        w = weights.reshape(r * r * r, 21)
        beta, alpha, gamma = normalize_weights(w)
    else:
        beta = jnp.ones((r * r * r, 12), dtype)
        alpha = jnp.ones((r * r * r, 8), dtype)
        gamma = jnp.ones((r * r * r,), dtype)

    # per-cube corner data
    g = jnp.arange(r)
    base = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    cpos = base[:, None, :] + corners[None]                    # [C, 8, 3]
    csdf = sdf[cpos[..., 0], cpos[..., 1], cpos[..., 2]]       # [C, 8]
    if deform is not None:
        cdef = deform[cpos[..., 0], cpos[..., 1], cpos[..., 2]]
    else:
        cdef = jnp.zeros(cpos.shape, dtype)
    cxyz = (cpos.astype(dtype) + cdef) * (grid_scale / r)      # [C, 8, 3]

    occ8 = csdf < 0

    # alpha-weighted zero crossings on the 12 cube edges
    a, b = edges[:, 0], edges[:, 1]
    sa = csdf[:, a] * alpha[:, a]                              # [C, 12]
    sb = csdf[:, b] * alpha[:, b]
    crossing = occ8[:, a] != occ8[:, b]                        # [C, 12]
    denom = sb - sa
    denom = jnp.where(jnp.abs(denom) < 1e-10, 1e-10, denom)
    # ue = (x_a * s_b*alpha_b - x_b * s_a*alpha_a) / (s_b*alpha_b - s_a*alpha_a)
    ue = (cxyz[:, a] * sb[..., None] - cxyz[:, b] * sa[..., None]) / denom[..., None]

    # beta-weighted dual vertex per cube
    wgt = jnp.where(crossing, beta, 0.0)                       # [C, 12]
    wsum = jnp.maximum(jnp.sum(wgt, -1, keepdims=True), 1e-10)
    vd = jnp.sum(ue * wgt[..., None], axis=1) / wsum           # [C, 3]
    n_in = jnp.sum(occ8, -1)
    surf = (n_in > 0) & (n_in < 8)
    vd = vd * surf[:, None]

    # L_dev analog (flexicubes.py:105-113): mean |dist - mean_dist| of the
    # crossing points from their dual vertex
    dist = jnp.linalg.norm(ue - vd[:, None, :], axis=-1)       # [C, 12]
    n_cross = jnp.maximum(jnp.sum(crossing, -1), 1)
    mean_d = jnp.sum(jnp.where(crossing, dist, 0.0), -1) / n_cross
    mad = jnp.where(crossing, jnp.abs(dist - mean_d[:, None]), 0.0)
    l_dev = jnp.sum(mad) / jnp.maximum(jnp.sum(crossing), 1)

    # quads: one per interior grid edge with a sign change
    quad_np, va_np, vb_np = _quad_cubes(r)
    quad = jnp.asarray(quad_np)                                # [E, 4]
    va = jnp.asarray(va_np)
    vb = jnp.asarray(vb_np)
    occ_grid = sdf < 0
    oa = occ_grid[va[:, 0], va[:, 1], va[:, 2]]
    ob = occ_grid[vb[:, 0], vb[:, 1], vb[:, 2]]
    e_cross = oa != ob                                         # [E]
    # winding: the quad is cyclic CCW viewed from the +axis side; when the
    # edge START is inside (occupied), the outward normal points toward
    # +axis and CCW is correct; otherwise reverse the cycle.
    flip = ~oa
    q = jnp.where(flip[:, None], quad[:, jnp.asarray([0, 3, 2, 1])], quad)

    gq = gamma[q]                                              # [E, 4]
    g02 = gq[:, 0] * gq[:, 2]
    g13 = gq[:, 1] * gq[:, 3]

    if not training:
        # diagonal by gamma product (quad_split_1 / quad_split_2)
        use_02 = (g02 > g13)[:, None]
        s1 = q[:, jnp.asarray([0, 1, 2, 0, 2, 3])]
        s2 = q[:, jnp.asarray([0, 1, 3, 3, 1, 2])]
        tris = jnp.where(use_02, s1, s2).reshape(-1, 3)        # [2E, 3]
        face_valid = jnp.repeat(e_cross, 2)
        verts = vd
    else:
        # gamma-weighted center vertex + 4 triangles (quad_split_train)
        vq = vd[q]                                             # [E, 4, 3]
        v02 = 0.5 * (vq[:, 0] + vq[:, 2])
        v13 = 0.5 * (vq[:, 1] + vq[:, 3])
        denom_g = (g02 + g13 + 1e-8)[:, None]
        center = (v02 * g02[:, None] + v13 * g13[:, None]) / denom_g
        center = center * e_cross[:, None]
        c_idx = vd.shape[0] + jnp.arange(q.shape[0], dtype=jnp.int32)
        pairs = q[:, jnp.asarray([[0, 1], [1, 2], [2, 3], [3, 0]])]  # [E,4,2]
        tris = jnp.concatenate(
            [pairs, jnp.broadcast_to(c_idx[:, None, None], pairs[..., :1].shape)],
            axis=-1,
        ).reshape(-1, 3)                                        # [4E, 3]
        face_valid = jnp.repeat(e_cross, 4)
        verts = jnp.concatenate([vd, center], axis=0)

    tris = jnp.where(face_valid[:, None], tris, 0)
    return FlexiMesh(verts=verts, faces=tris.astype(jnp.int32),
                     face_valid=face_valid, l_dev=l_dev)
