"""Cameras: OpenCV-normalized intrinsics, COLMAP world-to-view extrinsics,
OpenGL projection (reference renderers/gaussian_render.py:57-83,310-321;
orbit rigs in trellis/utils/render_utils.py:13-42).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.struct
import jax.numpy as jnp
import numpy as np


def intrinsics_to_projection(intrinsics: jnp.ndarray, near: float, far: float) -> jnp.ndarray:
    """[3,3] OpenCV normalized intrinsics -> [4,4] OpenGL perspective matrix."""
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    z = jnp.zeros((), jnp.float32)
    ret = jnp.array(
        [
            [2 * fx, z, 2 * cx - 1, z],
            [z, 2 * fy, -2 * cy + 1, z],
            [z, z, far / (far - near), near * far / (near - far)],
            [z, z, jnp.ones((), jnp.float32), z],
        ]
    )
    return ret


@flax.struct.dataclass
class Camera:
    """A single pinhole camera for rasterization."""

    world_view: jnp.ndarray  # [4,4] w2c (COLMAP: x right, y down, z forward)
    intrinsics: jnp.ndarray  # [3,3] normalized OpenCV intrinsics
    height: int = flax.struct.field(pytree_node=False, default=512)
    width: int = flax.struct.field(pytree_node=False, default=512)
    near: float = flax.struct.field(pytree_node=False, default=0.01)
    far: float = flax.struct.field(pytree_node=False, default=100.0)

    @property
    def fov_x(self):
        return 2.0 * jnp.arctan(0.5 / self.intrinsics[0, 0])

    @property
    def fov_y(self):
        return 2.0 * jnp.arctan(0.5 / self.intrinsics[1, 1])

    @property
    def tan_fov_x(self):
        return 0.5 / self.intrinsics[0, 0]

    @property
    def tan_fov_y(self):
        return 0.5 / self.intrinsics[1, 1]

    @property
    def projection(self):
        return intrinsics_to_projection(self.intrinsics, self.near, self.far)

    @property
    def full_proj(self):
        """[4,4] world -> clip (projection @ world_view)."""
        return self.projection @ self.world_view

    @property
    def campos(self):
        c2w = jnp.linalg.inv(self.world_view)
        return c2w[:3, 3]


def fov_intrinsics(fov_deg: float) -> np.ndarray:
    """Normalized intrinsics for a square image with the given vertical FoV."""
    f = 0.5 / math.tan(math.radians(fov_deg) / 2)
    return np.array([[f, 0, 0.5], [0, f, 0.5], [0, 0, 1]], dtype=np.float32)


def lookat_extrinsics(eye, target=(0, 0, 0), up=(0, 0, 1)) -> np.ndarray:
    """[4,4] world-to-view, COLMAP convention (z forward, y down)."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    r = np.stack([right, down, fwd], axis=0)  # world->cam rotation
    t = -r @ eye
    w2c = np.eye(4, dtype=np.float64)
    w2c[:3, :3] = r
    w2c[:3, 3] = t
    return w2c.astype(np.float32)


def orbit_camera(
    yaw_deg: float,
    pitch_deg: float,
    radius: float = 2.0,
    fov_deg: float = 40.0,
    height: int = 512,
    width: int = 512,
    target=(0.0, 0.0, 0.0),
) -> Camera:
    """Orbit rig around the origin (reference trellis/utils/render_utils.py:13)."""
    yaw = math.radians(yaw_deg)
    pitch = math.radians(pitch_deg)
    eye = np.array(
        [
            radius * math.cos(pitch) * math.sin(yaw),
            radius * math.cos(pitch) * math.cos(yaw),
            radius * math.sin(pitch),
        ]
    ) + np.asarray(target)
    return Camera(
        world_view=jnp.asarray(lookat_extrinsics(eye, target)),
        intrinsics=jnp.asarray(fov_intrinsics(fov_deg)),
        height=height,
        width=width,
    )


def orbit_cameras(num: int, pitch_deg: float = 20.0, **kw) -> Tuple[Camera, ...]:
    return tuple(
        orbit_camera(360.0 * i / num, pitch_deg, **kw) for i in range(num)
    )
