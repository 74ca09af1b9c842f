"""UV parametrization + texture baking for GLB export.

Capability re-design of the reference's texture-baked GLB path
(trellis/utils/postprocessing_utils.py:275-398: xatlas UV unwrap +
nvdiffrast-optimized bake). Neither external tool exists here, so:

  - UV unwrap: box (6-chart) parametrization — each face is assigned to the
    axis chart of its dominant normal, projected onto the two orthogonal
    axes, and the six charts are packed into a 3x2 atlas. Vertices are split
    per (vertex, chart) so every output vertex has a single UV.
  - Bake: rasterize each face's UV triangle on the texel grid (host-side
    numpy — meshes here are tens of k faces), barycentric-interpolate world
    positions, and sample an appearance function at those points. The default
    sampler takes radiance from the K nearest Gaussians' SH DC colors
    (MXU knn, ops/knn.py) — the GS field IS the appearance source, matching
    the reference's bake-from-observations intent without a GPU optimizer.
  - Dilation fills a margin around each chart so bilinear lookups at seams
    don't bleed background.

The baked texture rides into export_glb via TEXCOORD_0 + an embedded PNG.
"""

from __future__ import annotations

import struct
import zlib
from typing import Callable, Optional, Tuple

import numpy as np

# 6 box charts: (normal axis, sign) -> projection axes (u, v)
_CHARTS = [
    (0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1),
]
_PROJ = {0: (1, 2), 1: (0, 2), 2: (0, 1)}
# atlas layout: 3 columns x 2 rows
_ATLAS = [(c % 3, c // 3) for c in range(6)]


def box_unwrap(
    vertices: np.ndarray, faces: np.ndarray, margin: float = 0.02
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Box-projection UV unwrap.

    Returns (vertices_out [V',3], faces_out [F,3], uvs [V',2]) with vertices
    duplicated per (vertex, chart).
    """
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int64)
    v0, v1, v2 = (vertices[faces[:, i]] for i in range(3))
    n = np.cross(v1 - v0, v2 - v0)  # [F, 3]
    axis = np.abs(n).argmax(axis=1)
    sign = np.sign(np.take_along_axis(n, axis[:, None], 1))[:, 0]
    sign = np.where(sign == 0, 1, sign)
    chart = axis * 2 + (sign < 0)  # [F] in 0..5

    # split vertices per (vertex, chart)
    key = faces * 6 + chart[:, None]  # [F, 3]
    uniq, inv = np.unique(key.reshape(-1), return_inverse=True)
    faces_out = inv.reshape(-1, 3).astype(np.int64)
    src_vertex = uniq // 6
    src_chart = uniq % 6
    verts_out = vertices[src_vertex]

    # per-chart projection, normalized to the chart cell of the 3x2 atlas
    uvs = np.zeros((len(uniq), 2), np.float32)
    for c in range(6):
        m = src_chart == c
        if not m.any():
            continue
        ua, va = _PROJ[c // 2]
        p = verts_out[m][:, [ua, va]]
        lo = p.min(0)
        span = np.maximum(p.max(0) - lo, 1e-8)
        local = (p - lo) / span  # [0,1] in chart
        cell = np.asarray(_ATLAS[c], np.float32)
        cell_size = np.asarray([1.0 / 3.0, 1.0 / 2.0], np.float32)
        pad = margin * cell_size
        uvs[m] = (cell * cell_size + pad + local * (cell_size - 2 * pad))
    return verts_out, faces_out, uvs


def gaussian_color_sampler(
    xyz: np.ndarray, features_dc: np.ndarray, opacity: Optional[np.ndarray] = None,
    k: int = 8,
) -> Callable[[np.ndarray], np.ndarray]:
    """Appearance from a Gaussian set: RGB at a point = distance-weighted
    blend of the K nearest Gaussians' SH-DC colors (C0 convention,
    reference representations/gaussian_model.py SH usage)."""
    import jax.numpy as jnp

    from ..ops.knn import knn_points

    C0 = 0.28209479177387814
    xyz = np.asarray(xyz, np.float32)
    rgb = np.clip(0.5 + C0 * np.asarray(features_dc, np.float32).reshape(len(xyz), -1)[:, :3], 0, 1)
    if opacity is not None:
        keep = np.asarray(opacity).reshape(-1) > 0.05
        if keep.any():
            xyz, rgb = xyz[keep], rgb[keep]

    def sample(points: np.ndarray) -> np.ndarray:
        if len(points) == 0:
            return np.zeros((0, 3), np.float32)
        d2, idx = knn_points(
            jnp.asarray(points[None], jnp.float32), jnp.asarray(xyz[None]), k
        )
        d2 = np.asarray(d2[0])
        idx = np.asarray(idx[0])
        w = 1.0 / (d2 + 1e-8)
        w = w / w.sum(axis=1, keepdims=True)
        return (rgb[idx] * w[..., None]).sum(axis=1).astype(np.float32)

    return sample


def bake_texture(
    vertices: np.ndarray,
    faces: np.ndarray,
    uvs: np.ndarray,
    sample_fn: Callable[[np.ndarray], np.ndarray],
    size: int = 512,
    dilate: int = 4,
) -> np.ndarray:
    """Rasterize faces on the UV texel grid, sample appearance at the
    barycentric world positions. Returns [size, size, 3] float in [0,1]."""
    tex = np.zeros((size, size, 3), np.float32)
    covered = np.zeros((size, size), bool)
    pts, locs = [], []
    for f in range(len(faces)):
        tri_uv = uvs[faces[f]] * size  # [3, 2] in texel units
        tri_p = vertices[faces[f]]  # [3, 3]
        lo = np.floor(tri_uv.min(0)).astype(int)
        hi = np.ceil(tri_uv.max(0)).astype(int)
        lo = np.clip(lo, 0, size - 1)
        hi = np.clip(hi, 0, size - 1)
        if (hi < lo).any():
            continue
        xs = np.arange(lo[0], hi[0] + 1)
        ys = np.arange(lo[1], hi[1] + 1)
        gx, gy = np.meshgrid(xs, ys)
        px = np.stack([gx.ravel() + 0.5, gy.ravel() + 0.5], 1)  # texel centers
        # barycentric coords
        a, b, c = tri_uv
        det = (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        if abs(det) < 1e-12:
            continue
        w1 = ((px[:, 0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (px[:, 1] - a[1])) / det
        w2 = ((b[0] - a[0]) * (px[:, 1] - a[1]) - (px[:, 0] - a[0]) * (b[1] - a[1])) / det
        w0 = 1.0 - w1 - w2
        eps = -1e-4
        inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps)
        if not inside.any():
            continue
        w = np.stack([w0, w1, w2], 1)[inside]
        p = w @ tri_p  # [n, 3] world positions
        loc = px[inside].astype(int)
        pts.append(p)
        locs.append(loc)
    if pts:
        pts_all = np.concatenate(pts)
        locs_all = np.concatenate(locs)
        colors = np.asarray(sample_fn(pts_all), np.float32)
        tex[locs_all[:, 1], locs_all[:, 0]] = colors
        covered[locs_all[:, 1], locs_all[:, 0]] = True

    # dilation: fill uncovered texels from covered neighbors (seam margin)
    for _ in range(dilate):
        if covered.all():
            break
        acc = np.zeros_like(tex)
        cnt = np.zeros((size, size), np.float32)
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            shifted = np.roll(covered, (dy, dx), (0, 1))
            vals = np.roll(tex, (dy, dx), (0, 1))
            m = shifted & ~covered
            acc[m] += vals[m]
            cnt[m] += 1
        newly = cnt > 0
        tex[newly] = acc[newly] / cnt[newly][:, None]
        covered |= newly
    return np.clip(tex, 0, 1)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal RGB8 PNG encoder (zlib, no external deps)."""
    img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    h, w = img8.shape[:2]
    raw = b"".join(
        b"\x00" + img8[r].tobytes() for r in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png_size(data: bytes) -> Tuple[int, int]:
    """(w, h) from a PNG header (for tests)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def to_textured_glb(
    path: str,
    vertices: np.ndarray,
    faces: np.ndarray,
    gs_xyz: np.ndarray,
    gs_features_dc: np.ndarray,
    gs_opacity: Optional[np.ndarray] = None,
    texture_size: int = 512,
) -> int:
    """Full baked-GLB path: unwrap -> bake from the Gaussian field -> export
    (capability of reference postprocessing_utils.to_glb with texture=True)."""
    from .glb_export import export_glb

    v2, f2, uv = box_unwrap(vertices, faces)
    sampler = gaussian_color_sampler(gs_xyz, gs_features_dc, gs_opacity)
    tex = bake_texture(v2, f2, uv, sampler, size=texture_size)
    return export_glb(path, v2, f2, uvs=uv, texture_png=encode_png(tex))
