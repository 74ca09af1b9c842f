"""Small script-level helpers (reference utils/script_util.py:7-124).

The diffusion factory lives in diffusion/gaussian_diffusion.create_diffusion
and diffusion/respace.spaced_diffusion; psnr in ops/ssim.py; build_rotation
in ops/quaternion.quat_to_rotmat. This module holds the remaining pieces.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..diffusion.gaussian_diffusion import GaussianDiffusion


def init_volume_grid(resolution: int, normalize: bool = True) -> np.ndarray:
    """[R^3, 3] dense voxel-center coordinates (reference :77-95)."""
    g = np.arange(resolution, dtype=np.float32)
    grid = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    if normalize:
        grid = (grid + 0.5) / resolution
    return grid


def predict_x0_from_q(
    diffusion: GaussianDiffusion, x_start: jnp.ndarray, t: jnp.ndarray,
    noise: jnp.ndarray, model_output: jnp.ndarray,
) -> jnp.ndarray:
    """Recover the model's implied x0 from a training forward pass
    (reference :64-76): q_sample then invert through the mean-type."""
    x_t = diffusion.q_sample(x_start, t, noise)
    if diffusion.mean_type == "eps":
        return diffusion.predict_xstart_from_eps(x_t, t, model_output)
    if diffusion.mean_type == "v":
        return diffusion.predict_xstart_from_v(x_t, t, model_output)
    if diffusion.mean_type == "x0":
        return model_output
    raise NotImplementedError(diffusion.mean_type)
