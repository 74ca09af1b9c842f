"""Mesh postprocessing: simplification + hole statistics (host-side numpy).

Capability re-design of the reference's mesh postprocess chain
(trellis/utils/postprocessing_utils.py:21-199 fill-holes + simplify, which
lean on igraph/pyvista): vertex-clustering simplification (grid quantization,
the standard GPU-friendly decimation), degenerate-face removal, and boundary-
edge (hole) detection. Texture baking (xatlas + nvdiffrast optimization) is
external-GPU tooling; vertex colors are the supported appearance path here.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def remove_degenerate_faces(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    area2 = np.linalg.norm(np.cross(b - a, c - a), axis=-1)
    distinct = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return faces[(area2 > 1e-12) & distinct]


def simplify_vertex_clustering(
    verts: np.ndarray, faces: np.ndarray, cell_size: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge vertices within grid cells of `cell_size`; collapse faces."""
    keys = np.floor(verts / cell_size).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    # new vertex = mean of cluster members
    new_verts = np.zeros((len(uniq), 3), np.float64)
    cnt = np.zeros(len(uniq), np.int64)
    np.add.at(new_verts, inv, verts)
    np.add.at(cnt, inv, 1)
    new_verts = (new_verts / cnt[:, None]).astype(np.float32)
    new_faces = inv[faces]
    new_faces = remove_degenerate_faces(new_verts, new_faces)
    # drop duplicate faces (any vertex order)
    key = np.sort(new_faces, axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    return new_verts, new_faces[np.sort(first)]


def boundary_edges(faces: np.ndarray) -> np.ndarray:
    """Edges used by exactly one face — the hole boundaries. [K, 2]."""
    e = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    e = np.sort(e, axis=1)
    uniq, counts = np.unique(e, axis=0, return_counts=True)
    return uniq[counts == 1]


def fill_holes_fan(verts: np.ndarray, faces: np.ndarray,
                   max_hole_edges: int = 64) -> np.ndarray:
    """Triangle-fan fill of small boundary loops (reference fill-holes
    capability; loops above `max_hole_edges` left open)."""
    be = boundary_edges(faces)
    if len(be) == 0:
        return faces
    # build adjacency among boundary vertices
    adj = {}
    for a, b in be:
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    visited = set()
    new_faces = [faces]
    for start in list(adj):
        if start in visited:
            continue
        loop = [start]
        visited.add(start)
        cur, prev = start, -1
        while True:
            nxts = [v for v in adj.get(cur, []) if v != prev and v not in visited]
            if not nxts:
                break
            prev, cur = cur, nxts[0]
            visited.add(cur)
            loop.append(cur)
        if 3 <= len(loop) <= max_hole_edges:
            fan = np.array(
                [[loop[0], loop[i], loop[i + 1]] for i in range(1, len(loop) - 1)],
                faces.dtype,
            )
            new_faces.append(fan)
    return np.concatenate(new_faces, axis=0)
