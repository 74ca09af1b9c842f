"""PLY save/load for Gaussian splats.

Re-design of reference representations/gaussian/gaussian_model.py:162-233
(save_ply/load_ply with the y/z axis transform). Self-contained binary PLY
writer/reader (no plyfile dependency): binary_little_endian 1.0, property
layout identical to the 3DGS ecosystem (x,y,z, nx,ny,nz, f_dc_*, opacity,
scale_*, rot_*) so outputs open in standard 3DGS viewers.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .gaussians import GaussianSplat, from_activated

# the reference applies this transform when saving (gaussian_model.py:175):
# world xyz -> (x, -z, y) to convert z-up to the PLY convention it uses
_AXES = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)


def save_ply(gs: GaussianSplat, path: str, valid: Optional[np.ndarray] = None,
             transform_axes: bool = True) -> int:
    """Write activated Gaussians to a binary PLY. Returns point count."""
    xyz = np.asarray(gs.get_xyz, np.float32)
    dc = np.asarray(gs.get_features, np.float32)[..., 0, :]
    # store inverse-activated values like the reference (raw + bias domain)
    scale = np.log(np.maximum(np.asarray(gs.get_scaling, np.float32), 1e-10))
    rot = np.asarray(gs.get_rotation, np.float32)
    op = np.asarray(gs.get_opacity, np.float32)
    op_raw = np.log(op / np.maximum(1.0 - op, 1e-10))

    if valid is not None:
        m = np.asarray(valid).astype(bool)
        xyz, dc, scale, rot, op_raw = xyz[m], dc[m], scale[m], rot[m], op_raw[m]
    if transform_axes:
        xyz = xyz @ _AXES.T
    n = xyz.shape[0]

    props = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in props)
        + "end_header\n"
    )
    data = np.concatenate(
        [xyz, np.zeros((n, 3), np.float32), dc, op_raw.reshape(n, 1),
         scale, rot], axis=1
    ).astype("<f4")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(data.tobytes())
    return n


def load_ply(path: str, transform_axes: bool = True,
             **gs_kwargs) -> GaussianSplat:
    """Read a 3DGS-layout PLY back into a GaussianSplat."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode("ascii").splitlines()
        n = next(int(l.split()[-1]) for l in lines if l.startswith("element vertex"))
        props = [l.split()[-1] for l in lines if l.startswith("property")]
        raw = np.frombuffer(f.read(n * len(props) * 4), dtype="<f4")
    data = raw.reshape(n, len(props))
    col = {p: i for i, p in enumerate(props)}
    xyz = data[:, [col["x"], col["y"], col["z"]]]
    if transform_axes:
        xyz = xyz @ _AXES  # inverse of _AXES.T (orthonormal)
    dc = data[:, [col["f_dc_0"], col["f_dc_1"], col["f_dc_2"]]]
    scale = np.exp(data[:, [col["scale_0"], col["scale_1"], col["scale_2"]]])
    rot = data[:, [col[f"rot_{i}"] for i in range(4)]]
    op = 1.0 / (1.0 + np.exp(-data[:, col["opacity"]]))
    activated = np.concatenate(
        [xyz, scale, rot, dc, op[:, None]], axis=1
    ).astype(np.float32)
    import jax.numpy as jnp

    return from_activated(jnp.asarray(activated), **gs_kwargs)
