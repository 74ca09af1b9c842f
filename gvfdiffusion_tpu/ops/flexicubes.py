"""FlexiCubes iso-surface extraction (Shen et al. 2023) — TPU-static design.

Carries the reference's full learned-weight scheme
(trellis/representations/mesh/flexicubes/flexicubes.py):

  - alpha [8/cube]:  per-corner field reweighting of the edge zero-crossings
    (flexicubes.py:249-263 `_linear_interp(s * alpha, x)`).
  - beta  [12/cube]: per-edge weights averaging each dual-vertex group's
    crossing points into that DUAL VERTEX (flexicubes.py:310-313
    `index_add(ue * beta)/sum`).
  - gamma [1/cube]:  quad-split weighting — inference picks the diagonal by
    comparing gamma products of opposite corners (flexicubes.py:356-364);
    training inserts a gamma-weighted center vertex and emits 4 triangles
    (flexicubes.py:365-380) so the split stays differentiable.

Dual Marching Cubes vertex grouping (flexicubes.py:268-330 + tables.py):
each cube emits up to FOUR dual vertices — one per surface sheet — with the
per-case edge grouping of `dmc_table` and the C16/C19 ambiguous-face
inversion of `check_table`. Instead of translating the reference's
data-dependent masked_select/index_add batching, the TPU design pads every
cube to a STATIC 4-slot vertex layout (vert id = cube*4 + slot) and drives
slot membership with a host-derived [256, 12] edge->slot table; the
triangulation gathers each adjacent cube's matching slot through a static
per-orientation local-edge table. The tables themselves are DERIVED, not
copied: a dual vertex per connected component of inside corners (outside
corners for the four body-diagonal cases), problematic cases = exactly one
ambiguous face with >=5 inside corners, alternative case = bitwise
complement. tests/test_flexicubes.py asserts exact equality with the
reference's dmc_table/num_vd_table/check_table.

Outputs are PADDED: verts [R^3*4(+E), 3] four slots per cube (+ one per
interior edge in training mode), faces [F, 3] with face_valid. Invalid
faces reference slot 0 with zeroed vertices; weld on host via
marching_tets.weld_mesh.

Weight normalization matches `_normalize_weights` (flexicubes.py:116-136):
beta/alpha = tanh(w)*0.99 + 1, gamma = sigmoid(w)*0.99 + 0.005.

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


def _build_dmc_tables():
    """Derive the Dual-Marching-Cubes case tables on the host.

    Returns
      edge_slot [256, 12] int32: dual-vertex slot (0..3) owning each
        crossing cube edge, -1 for non-crossing edges;
      num_vd    [256]      int32: dual vertices emitted by the case;
      problem   [256]      bool : C16/C19-style ambiguous case flag;
      prob_dir  [256, 3]   int32: offset to the cube across the ambiguous
        face (check_table[:, 1:4]); the alternative case is 255 - case.

    Derivation (verified exact against the reference tables.py in
    tests/test_flexicubes.py::test_dmc_tables_match_reference):
      - one dual vertex per connected component (over cube edges) of the
        INSIDE corner set; a crossing edge belongs to its inside endpoint's
        component. For the four cases whose OUTSIDE set is a body-diagonal
        corner pair ({0,7},{1,6},{2,5},{3,4} — the complements of C16/C19)
        the two isolated outside corners each carve their own sheet, so the
        grouping uses outside components instead.
      - a case is 'problematic' iff exactly one cube face carries a
        diagonal inside/outside pattern AND the inside set has the majority
        (>= 5 corners); its alternative interpretation is the complement
        case (inside/outside swap), which resolves the shared ambiguous
        face consistently between the two adjacent cubes.
    """
    adj = {i: set() for i in range(8)}
    for a, b in CUBE_EDGES:
        adj[a].add(b)
        adj[b].add(a)

    def components(corners):
        comps, seen = [], set()
        for c in sorted(corners):
            if c in seen:
                continue
            comp, stack = {c}, [c]
            while stack:
                u = stack.pop()
                for v in adj[u]:
                    if v in corners and v not in comp:
                        comp.add(v)
                        stack.append(v)
            seen |= comp
            comps.append(comp)
        return comps

    body_diag = [{0, 7}, {1, 6}, {2, 5}, {3, 4}]
    # the 6 faces as (axis, side, corner list) for ambiguity detection
    faces = []
    for axis in range(3):
        for side in (0, 1):
            cs = [i for i in range(8) if CORNER_OFFSETS[i][axis] == side]
            faces.append((axis, side, cs))

    edge_slot = np.full((256, 12), -1, np.int32)
    num_vd = np.zeros((256,), np.int32)
    problem = np.zeros((256,), bool)
    prob_dir = np.zeros((256, 3), np.int32)

    for case in range(256):
        inside = {i for i in range(8) if (case >> i) & 1}
        outside = set(range(8)) - inside
        if not inside or not outside:
            continue
        group_side = outside if outside in body_diag else inside
        comps = components(group_side)
        num_vd[case] = len(comps)
        for e, (a, b) in enumerate(CUBE_EDGES):
            if (a in inside) == (b in inside):
                continue
            c = a if a in group_side else b
            for gi, comp in enumerate(comps):
                if c in comp:
                    edge_slot[case, e] = gi
                    break
        # ambiguous face: its 4 corners split 2/2 along the face diagonals
        amb = []
        for axis, side, cs in faces:
            ins = [c for c in cs if c in inside]
            if len(ins) != 2:
                continue
            o = [a for a in range(3) if a != axis]
            same = (CORNER_OFFSETS[ins[0]][o[0]] != CORNER_OFFSETS[ins[1]][o[0]]
                    and CORNER_OFFSETS[ins[0]][o[1]] != CORNER_OFFSETS[ins[1]][o[1]])
            if same:
                amb.append((axis, side))
        if len(amb) == 1 and len(inside) >= 5:
            problem[case] = True
            axis, side = amb[0]
            prob_dir[case, axis] = 1 if side == 1 else -1

    return edge_slot, num_vd, problem, prob_dir


EDGE_SLOT, NUM_VD, PROBLEM, PROB_DIR = _build_dmc_tables()
MAX_VD = 4


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


# local cube-edge index of a grid edge within each of its 4 adjacent cubes,
# per orientation, in the cyclic order _quad_cubes emits the cubes.
# x-edge at vertex (i,j,k): cube (i,j-1,k-1) sees it at local (y=1,z=1)
# -> edge 6 ([6,7]); (i,j,k-1) -> (y=0,z=1) edge 2; (i,j,k) -> edge 0;
# (i,j-1,k) -> (y=1,z=0) edge 4. Similarly for y (edges 8-11) and z (1,3,5,7).
_LOCAL_EDGE = {
    "x": np.array([6, 2, 0, 4], np.int32),
    "y": np.array([10, 9, 8, 11], np.int32),
    "z": np.array([5, 7, 3, 1], np.int32),
}


def _quad_cubes(r: int):
    """For each interior grid edge (3 orientations), the 4 adjacent cube
    linear ids (x-major: id = x*R^2 + y*R + z) in cyclic order around the
    edge axis, the edge's two vertex grid coords, and the local cube-edge
    index of the grid edge inside each adjacent cube. Host-side numpy —
    static tables baked into the jaxpr."""
    quads, va, vb, led = [], [], [], []
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
    led.append(np.broadcast_to(_LOCAL_EDGE["x"], (len(i), 4)))

    # y-edges: vertex (i, j, k) -> (i, j+1, k); cubes over (i-1..i, k-1..k)
    i, j, k = np.meshgrid(rng[1:], rng, rng[1:], indexing="ij")
    i, j, k = i.ravel(), j.ravel(), k.ravel()
    quads.append(np.stack([
        cube_id(i - 1, j, k - 1), cube_id(i - 1, j, k),
        cube_id(i, j, k), cube_id(i, j, k - 1),
    ], -1))
    va.append(np.stack([i, j, k], -1))
    vb.append(np.stack([i, j + 1, k], -1))
    led.append(np.broadcast_to(_LOCAL_EDGE["y"], (len(i), 4)))

    # z-edges: vertex (i, j, k) -> (i, j, k+1); cubes over (i-1..i, j-1..j)
    i, j, k = np.meshgrid(rng[1:], rng[1:], rng, indexing="ij")
    i, j, k = i.ravel(), j.ravel(), k.ravel()
    quads.append(np.stack([
        cube_id(i - 1, j - 1, k), cube_id(i, j - 1, k),
        cube_id(i, j, k), cube_id(i - 1, j, k),
    ], -1))
    va.append(np.stack([i, j, k], -1))
    vb.append(np.stack([i, j, k + 1], -1))
    led.append(np.broadcast_to(_LOCAL_EDGE["z"], (len(i), 4)))

    return (
        np.concatenate(quads, 0),
        np.concatenate(va, 0),
        np.concatenate(vb, 0),
        np.concatenate(led, 0),
    )


def flexicubes_dense(
    sdf: jnp.ndarray,                   # [R+1, R+1, R+1]
    deform: Optional[jnp.ndarray] = None,   # [R+1, R+1, R+1, 3]
    weights: Optional[jnp.ndarray] = None,  # [R, R, R, 21] RAW (see normalize)
    grid_scale: float = 1.0,
    training: bool = False,
) -> FlexiMesh:
    """Multi-dual-vertex FlexiCubes extraction of a dense SDF grid."""
    r = sdf.shape[0] - 1
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

    # DMC case id + the C16/C19 ambiguity inversion (flexicubes.py:140-178):
    # a problematic cube whose neighbor across the ambiguous face is also
    # problematic flips to the complement interpretation (both cubes flip,
    # since each points at the other).
    bits = jnp.asarray(2 ** np.arange(8), jnp.int32)
    case = jnp.sum(occ8.astype(jnp.int32) * bits[None], -1)    # [C]
    prob_grid = jnp.asarray(PROBLEM)[case].reshape(r, r, r)
    pdir = jnp.asarray(PROB_DIR)[case].reshape(r, r, r, 3)
    pos3 = base.reshape(r, r, r, 3)
    npos = pos3 + pdir
    within = jnp.all((npos >= 0) & (npos < r), -1)
    npc = jnp.clip(npos, 0, r - 1)
    nprob = prob_grid[npc[..., 0], npc[..., 1], npc[..., 2]]
    invert = (prob_grid & nprob & within).reshape(-1)
    case = jnp.where(invert, 255 - case, case)

    # alpha-weighted zero crossings on the 12 cube edges
    a, b = edges[:, 0], edges[:, 1]
    sa = csdf[:, a] * alpha[:, a]                              # [C, 12]
    sb = csdf[:, b] * alpha[:, b]
    crossing = occ8[:, a] != occ8[:, b]                        # [C, 12]
    denom = sb - sa
    denom = jnp.where(jnp.abs(denom) < 1e-10, 1e-10, denom)
    # ue = (x_a * s_b*alpha_b - x_b * s_a*alpha_a) / (s_b*alpha_b - s_a*alpha_a)
    ue = (cxyz[:, a] * sb[..., None] - cxyz[:, b] * sa[..., None]) / denom[..., None]

    # beta-weighted dual vertex per SLOT: slot s averages only the crossing
    # edges the case table assigns to sheet s (flexicubes.py:310-313)
    es = jnp.asarray(EDGE_SLOT)[case]                          # [C, 12]
    slot_ids = jnp.arange(MAX_VD, dtype=jnp.int32)
    in_slot = (es[:, None, :] == slot_ids[None, :, None]) & crossing[:, None, :]
    wgt = jnp.where(in_slot, beta[:, None, :], 0.0)            # [C, 4, 12]
    wsum = jnp.maximum(jnp.sum(wgt, -1), 1e-10)                # [C, 4]
    vd = jnp.sum(ue[:, None] * wgt[..., None], axis=2) / wsum[..., None]
    n_in = jnp.sum(occ8, -1)
    surf = (n_in > 0) & (n_in < 8)
    vd = vd * surf[:, None, None]                              # [C, 4, 3]

    # L_dev analog (flexicubes.py:105-113): mean |dist - mean_dist| of each
    # sheet's crossing points from its dual vertex
    dist = jnp.linalg.norm(
        ue[:, None] - vd[:, :, None, :], axis=-1)              # [C, 4, 12]
    n_cross = jnp.maximum(jnp.sum(in_slot, -1), 1)             # [C, 4]
    mean_d = jnp.sum(jnp.where(in_slot, dist, 0.0), -1) / n_cross
    mad = jnp.where(in_slot, jnp.abs(dist - mean_d[..., None]), 0.0)
    l_dev = jnp.sum(mad) / jnp.maximum(jnp.sum(in_slot), 1)

    # quads: one per interior grid edge with a sign change; each adjacent
    # cube contributes the dual vertex whose edge group owns that edge
    quad_np, va_np, vb_np, led_np = _quad_cubes(r)
    quad = jnp.asarray(quad_np)                                # [E, 4]
    va = jnp.asarray(va_np)
    vb = jnp.asarray(vb_np)
    led = jnp.asarray(led_np)                                  # [E, 4]
    occ_grid = sdf < 0
    oa = occ_grid[va[:, 0], va[:, 1], va[:, 2]]
    ob = occ_grid[vb[:, 0], vb[:, 1], vb[:, 2]]
    e_cross = oa != ob                                         # [E]
    slot = jnp.maximum(es[quad, led], 0)                       # [E, 4]
    # winding: the quad is cyclic CCW viewed from the +axis side; when the
    # edge START is inside (occupied), the outward normal points toward
    # +axis and CCW is correct; otherwise reverse the cycle.
    flip = ~oa
    rev = jnp.asarray([0, 3, 2, 1])
    cube_q = jnp.where(flip[:, None], quad[:, rev], quad)      # [E, 4]
    vert_q = cube_q * MAX_VD + jnp.where(flip[:, None], slot[:, rev], slot)

    gq = gamma[cube_q]                                         # [E, 4]
    g02 = gq[:, 0] * gq[:, 2]
    g13 = gq[:, 1] * gq[:, 3]

    verts_flat = vd.reshape(-1, 3)                             # [C*4, 3]
    if not training:
        # diagonal by gamma product (quad_split_1 / quad_split_2)
        use_02 = (g02 > g13)[:, None]
        s1 = vert_q[:, jnp.asarray([0, 1, 2, 0, 2, 3])]
        s2 = vert_q[:, jnp.asarray([0, 1, 3, 3, 1, 2])]
        tris = jnp.where(use_02, s1, s2).reshape(-1, 3)        # [2E, 3]
        face_valid = jnp.repeat(e_cross, 2)
        verts = verts_flat
    else:
        # gamma-weighted center vertex + 4 triangles (quad_split_train)
        vq = verts_flat[vert_q]                                # [E, 4, 3]
        v02 = 0.5 * (vq[:, 0] + vq[:, 2])
        v13 = 0.5 * (vq[:, 1] + vq[:, 3])
        denom_g = (g02 + g13 + 1e-8)[:, None]
        center = (v02 * g02[:, None] + v13 * g13[:, None]) / denom_g
        center = center * e_cross[:, None]
        c_idx = verts_flat.shape[0] + jnp.arange(
            vert_q.shape[0], dtype=jnp.int32)
        pairs = vert_q[:, jnp.asarray([[0, 1], [1, 2], [2, 3], [3, 0]])]
        tris = jnp.concatenate(
            [pairs, jnp.broadcast_to(c_idx[:, None, None], pairs[..., :1].shape)],
            axis=-1,
        ).reshape(-1, 3)                                        # [4E, 3]
        face_valid = jnp.repeat(e_cross, 4)
        verts = jnp.concatenate([verts_flat, center], axis=0)

    tris = jnp.where(face_valid[:, None], tris, 0)
    return FlexiMesh(verts=verts, faces=tris.astype(jnp.int32),
                     face_valid=face_valid, l_dev=l_dev)
