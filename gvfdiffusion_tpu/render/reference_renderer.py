"""Pure-jnp differentiable 3DGS rasterizer — the numerical reference.

Implements EWA splatting + front-to-back alpha compositing (Kerbl et al.,
"3D Gaussian Splatting", 2023; mip filter from Yu et al., "Mip-Splatting",
2024) entirely with dense jnp ops: every Gaussian is evaluated at every pixel,
with transmittance via a depth-sorted cumulative product. O(P*N) memory — use
for tests/small renders and as the golden model for the tiled Pallas kernel
(gvfdiffusion_tpu/ops/rasterize). Fully differentiable through jax.grad,
replacing the CUDA diff-gaussian-rasterization backward
(reference renderers/gaussian_render.py:85-143 dispatches to those kernels).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ..ops.quaternion import build_covariance
from ..ops.sh import rgb_from_sh_dc
from ..representations.camera import Camera
from ..representations.gaussians import GaussianSplat


def project_gaussians(
    means3d: jnp.ndarray,   # [N, 3] world
    scales: jnp.ndarray,    # [N, 3]
    rotations: jnp.ndarray,  # [N, 4]
    camera: Camera,
    kernel_size_2d: float = 0.3,
    mip: bool = False,
    cov3d: jnp.ndarray = None,
):
    """Project to screen space.

    Returns dict(mean2d [N,2] px, cov2d [N,2,2], depth [N], in_front [N],
    compensation [N]). `mip=False` adds the classic 0.3 px low-pass;
    `mip=True` adds kernel_size_2d with the Mip-Splatting opacity compensation.
    """
    n = means3d.shape[0]
    w2c = camera.world_view
    homog = jnp.concatenate([means3d, jnp.ones((n, 1), means3d.dtype)], axis=-1)
    t = (homog @ w2c.T)[:, :3]  # cam-space positions
    depth = t[:, 2]
    in_front = depth > camera.near

    fx = camera.intrinsics[0, 0] * camera.width
    fy = camera.intrinsics[1, 1] * camera.height
    cx = camera.intrinsics[0, 2] * camera.width
    cy = camera.intrinsics[1, 2] * camera.height

    tz = jnp.maximum(depth, 1e-6)
    # clamp x/y like the CUDA rasterizer (1.3x frustum) for Jacobian stability
    lim_x = 1.3 * camera.tan_fov_x
    lim_y = 1.3 * camera.tan_fov_y
    txz = jnp.clip(t[:, 0] / tz, -lim_x, lim_x) * tz
    tyz = jnp.clip(t[:, 1] / tz, -lim_y, lim_y) * tz

    w = w2c[:3, :3]
    if cov3d is None:
        # [N,3,3]; render_views precomputes this once — it is the one
        # view-independent piece of the projection (multi-view sweeps
        # otherwise rebuild it per view inside the lax.map body)
        cov3d = build_covariance(scales, rotations)
    # J W Σ Wᵀ Jᵀ expanded to ELEMENTWISE arithmetic: the Jacobian J is a
    # [N,2,3] with only 4 nonzero entries, so the chain is two [N,3]
    # row-combinations of W followed by quadratic forms over the symmetric
    # Σ — all lane-parallel VPU ops. (The one-einsum form lowers to batched
    # 2x3 matmuls with N as the batch: 131k tiny dot_generals that map onto
    # neither MXU tiles nor clean VPU code.)
    ja = (fx / tz)[:, None] * w[0] - (fx * txz / tz**2)[:, None] * w[2]  # [N,3]
    jb = (fy / tz)[:, None] * w[1] - (fy * tyz / tz**2)[:, None] * w[2]
    sa = jnp.sum(cov3d * ja[:, None, :], axis=-1)  # Σ·a  [N,3]
    sb = jnp.sum(cov3d * jb[:, None, :], axis=-1)
    c00 = jnp.sum(sa * ja, axis=-1)
    c01 = jnp.sum(sa * jb, axis=-1)
    c11 = jnp.sum(sb * jb, axis=-1)
    cov2d = jnp.stack(
        [jnp.stack([c00, c01], -1), jnp.stack([c01, c11], -1)], axis=-2
    )  # [N, 2, 2]

    if mip:
        det_raw = (
            cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0]
        )
        cov2d = cov2d + kernel_size_2d * jnp.eye(2, dtype=cov2d.dtype)
        det_blur = (
            cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0]
        )
        compensation = jnp.sqrt(
            jnp.maximum(det_raw / jnp.maximum(det_blur, 1e-12), 0.0)
        )
    else:
        cov2d = cov2d + kernel_size_2d * jnp.eye(2, dtype=cov2d.dtype)
        compensation = jnp.ones_like(depth)

    mean2d = jnp.stack(
        [fx * t[:, 0] / tz + cx, fy * t[:, 1] / tz + cy], axis=-1
    )
    return dict(
        mean2d=mean2d, cov2d=cov2d, depth=depth, in_front=in_front,
        compensation=compensation,
    )


def rasterize_dense(
    mean2d: jnp.ndarray,     # [N,2] px
    cov2d: jnp.ndarray,      # [N,2,2]
    colors: jnp.ndarray,     # [N,3]
    opacities: jnp.ndarray,  # [N]
    depths: jnp.ndarray,     # [N]
    valid: jnp.ndarray,      # [N] bool
    height: int,
    width: int,
    bg_color: jnp.ndarray,   # [3]
):
    """Dense per-pixel alpha compositing. Returns (rgb [H,W,3], depth [H,W],
    alpha [H,W])."""
    # sort front-to-back; invalid Gaussians pushed to the end with alpha 0
    sort_key = jnp.where(valid, depths, jnp.inf)
    order = jnp.argsort(sort_key)
    mean2d = mean2d[order]
    cov2d = cov2d[order]
    colors = colors[order]
    opacities = jnp.where(valid[order], opacities[order], 0.0)
    depths = depths[order]

    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0]
    det = jnp.maximum(det, 1e-12)
    # conic = inverse covariance
    c_a = cov2d[:, 1, 1] / det
    c_b = -cov2d[:, 0, 1] / det
    c_c = cov2d[:, 0, 0] / det

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    px, py = jnp.meshgrid(xs, ys)  # [H,W]
    dx = px[..., None] - mean2d[:, 0]  # [H,W,N]
    dy = py[..., None] - mean2d[:, 1]
    power = -0.5 * (c_a * dx * dx + c_c * dy * dy) - c_b * dx * dy
    alpha = jnp.minimum(0.99, opacities * jnp.exp(jnp.minimum(power, 0.0)))
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    alpha = jnp.where(alpha < 1.0 / 255.0, 0.0, alpha)

    # transmittance before each gaussian (front-to-back over sorted order)
    t_before = jnp.cumprod(1.0 - alpha, axis=-1) / (1.0 - alpha + 1e-10)
    weight = alpha * t_before  # [H,W,N]
    rgb = jnp.einsum("hwn,nc->hwc", weight, colors)
    depth_map = jnp.einsum("hwn,n->hw", weight, depths)
    acc = jnp.sum(weight, axis=-1)
    rgb = rgb + (1.0 - acc[..., None]) * bg_color
    return rgb, depth_map, acc


def render(
    gs: GaussianSplat,
    camera: Camera,
    bg_color=(0.0, 0.0, 0.0),
    delta: Optional[jnp.ndarray] = None,
    detach_static: bool = False,
    valid: Optional[jnp.ndarray] = None,
    mip: bool = False,
    kernel_size_2d: float = 0.3,
    override_color: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Render one GaussianSplat (optionally deformed by a 14-dim delta) from
    one camera. Mirrors the reference's GaussianRenderer.render contract
    (renderers/gaussian_render.py:85-177): returns dict(render, depth, alpha).
    """
    if delta is not None:
        attrs = gs.apply_variation(delta, detach_static=detach_static)
        xyz, scaling, rotation = attrs["xyz"], attrs["scaling"], attrs["rotation"]
        features, opacity = attrs["features"], attrs["opacity"]
    else:
        xyz, scaling, rotation = gs.get_xyz, gs.get_scaling, gs.get_rotation
        features, opacity = gs.get_features, gs.get_opacity

    proj = project_gaussians(
        xyz, scaling, rotation, camera, kernel_size_2d=kernel_size_2d, mip=mip
    )
    if override_color is None:
        colors = rgb_from_sh_dc(features[..., 0, :])  # deg-0 SH
    else:
        colors = override_color
    opac = opacity[..., 0] * proj["compensation"]
    v = proj["in_front"]
    if valid is not None:
        v = jnp.logical_and(v, valid)
    rgb, depth_map, acc = rasterize_dense(
        proj["mean2d"], proj["cov2d"], colors, opac, proj["depth"], v,
        camera.height, camera.width, jnp.asarray(bg_color, jnp.float32),
    )
    return {"render": rgb, "depth": depth_map, "alpha": acc}
