"""Volume ray-marching renderer for radiance-field representations.

Capability re-design of the reference's octree/TensoRF render paths
(trellis/renderers/octree_renderer.py:165 over diffoctreerast; the vestigial
renderers/pytorch_renderer CUDA ray-marcher): fixed-step ray marching with
alpha compositing, evaluated against any field function
`field(points [P,3]) -> (density [P], color [P,3])`. Static step count,
vmapped over pixels, chunked with lax.map — XLA-friendly and differentiable.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..representations.camera import Camera


def ray_grid(camera: Camera) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (origins [P,3], directions [P,3]) for every pixel."""
    h, w = camera.height, camera.width
    xs = (jnp.arange(w) + 0.5) / w
    ys = (jnp.arange(h) + 0.5) / h
    gx, gy = jnp.meshgrid(xs, ys)
    fx, fy = camera.intrinsics[0, 0], camera.intrinsics[1, 1]
    cx, cy = camera.intrinsics[0, 2], camera.intrinsics[1, 2]
    dirs_cam = jnp.stack(
        [(gx - cx) / fx, (gy - cy) / fy, jnp.ones_like(gx)], -1
    ).reshape(-1, 3)
    c2w = jnp.linalg.inv(camera.world_view)
    dirs = dirs_cam @ c2w[:3, :3].T
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(c2w[:3, 3], dirs.shape)
    return origins, dirs


def render_volume(
    field: Callable,
    camera: Camera,
    num_steps: int = 128,
    t_near: float = 0.2,
    t_far: float = 3.0,
    bg_color=(1.0, 1.0, 1.0),
    step_chunk: int = 4096,
    field_takes_dirs: bool = False,
    track_median_depth: bool = False,
) -> Dict[str, jnp.ndarray]:
    """March `num_steps` samples per ray through `field`; composite.

    density is interpreted per unit length (sigma); alpha_i = 1 - exp(-sigma dt).
    `field_takes_dirs`: call `field(points, dirs)` (view-dependent SH colors).
    `track_median_depth`: also return the depth where transmittance first
    crosses 0.5 (the reference trivec rasterizer's `percent_depth`).
    """
    h, w = camera.height, camera.width
    origins, dirs = ray_grid(camera)
    ts = jnp.linspace(t_near, t_far, num_steps)
    dt = (t_far - t_near) / num_steps
    bg = jnp.asarray(bg_color, jnp.float32)

    def ray_chunk(args):
        # All samples of the chunk evaluated in ONE field call + cumprod
        # compositing. The earlier scan-over-steps form serialized num_steps
        # tiny evaluations and measured 3.2-9.9 s/frame at 256^2 on the chip;
        # this form is the standard parallel NeRF quadrature (identical math).
        o, d = args  # [C, 3] each
        n = o.shape[0]
        pts = o[:, None] + ts[None, :, None] * d[:, None]      # [C, S, 3]
        flat = pts.reshape(-1, 3)
        if field_takes_dirs:
            drep = jnp.broadcast_to(d[:, None], pts.shape).reshape(-1, 3)
            sigma, color = field(flat, drep)
        else:
            sigma, color = field(flat)
        s = num_steps
        sigma = sigma.reshape(n, s)
        color = color.reshape(n, s, 3)
        alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dt)
        keep = 1.0 - alpha
        trans_before = jnp.concatenate(
            [jnp.ones((n, 1)), jnp.cumprod(keep, axis=1)[:, :-1]], axis=1
        )
        wgt = trans_before * alpha                              # [C, S]
        rgb = jnp.einsum("cs,csk->ck", wgt, color)
        depth_acc = wgt @ ts
        trans = trans_before[:, -1] * keep[:, -1]
        acc = 1.0 - trans
        rgb = rgb + trans[:, None] * bg
        # first step where transmittance crosses 0.5 (percent_depth)
        trans_after = trans_before * keep
        crossed = trans_after < 0.5
        any_cross = jnp.any(crossed, axis=1)
        med = jnp.where(any_cross, ts[jnp.argmax(crossed, axis=1)], 0.0)
        return rgb, depth_acc, acc, med

    p = origins.shape[0]
    pad = (-p) % step_chunk
    if pad:
        origins = jnp.concatenate([origins, jnp.zeros((pad, 3))])
        dirs = jnp.concatenate([dirs, jnp.ones((pad, 3))])
    nb = origins.shape[0] // step_chunk
    rgb, depth, acc, med = jax.lax.map(
        ray_chunk,
        (origins.reshape(nb, step_chunk, 3), dirs.reshape(nb, step_chunk, 3)),
    )
    rgb = rgb.reshape(-1, 3)[:p].reshape(h, w, 3)
    depth = depth.reshape(-1)[:p].reshape(h, w)
    acc = acc.reshape(-1)[:p].reshape(h, w)
    out = {"render": rgb, "depth": depth, "alpha": acc}
    if track_median_depth:
        out["median_depth"] = med.reshape(-1)[:p].reshape(h, w)
    return out
