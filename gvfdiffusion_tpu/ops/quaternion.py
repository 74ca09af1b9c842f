"""Quaternion math in pure JAX (replaces pytorch3d.transforms usage at
utils/inference_utils.py:174 and representations/gaussian/general_utils.py).

Convention: (w, x, y, z), normalized before use.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z) -> [..., 3, 3] rotation matrices."""
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        axis=-2,
    )


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w,x,y,z); branch-free Shepperd's method."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    qw = 0.5 * jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12))
    qx = 0.5 * jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12))
    qy = 0.5 * jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12))
    qz = 0.5 * jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12))
    qx = qx * jnp.sign(jnp.where(m21 - m12 == 0, 1.0, m21 - m12))
    qy = qy * jnp.sign(jnp.where(m02 - m20 == 0, 1.0, m02 - m20))
    qz = qz * jnp.sign(jnp.where(m10 - m01 == 0, 1.0, m10 - m01))
    return normalize(jnp.stack([qw, qx, qy, qz], axis=-1))


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, (w,x,y,z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def build_covariance(scaling: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """3DGS covariance: R diag(s^2) R^T from [...,3] scales + [...,4] quats.

    Expanded elementwise (broadcast-multiply + lane reduce) rather than an
    einsum: batched 3x3 matmuls with the gaussian count as the batch lower
    to per-element dot_generals that vectorize poorly on TPU."""
    r = quat_to_rotmat(rotation)
    rs = r * (scaling**2)[..., None, :]          # R diag(s²)   [..., 3, 3]
    return jnp.sum(
        rs[..., :, None, :] * r[..., None, :, :], axis=-1
    )                                            # (R diag(s²)) Rᵀ
