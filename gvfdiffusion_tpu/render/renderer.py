"""GaussianRenderer — the user-facing rendering API.

Mirrors the reference's GaussianRenderer contract
(renderers/gaussian_render.py:242-369: rendering_options near/far/bg_color/
resolution/ssaa, mip toggle + 2D kernel size, delta_pc application with
detach_static, random background for training) over two backends:

  "reference" — dense pure-jnp renderer (tests/small scenes; O(P*N) memory)
  "binned"    — tile-binned XLA blend, differentiable, bounded memory.
                `rounds` > 1 blends in depth-cursor rounds so dense scenes
                converge to the CUDA rasterizer's blend-all semantics
                (K_effective = max_per_tile * rounds); `early_exit` stops a
                tile chunk once its pixels saturate (inference only — the
                while_loop form is not reverse-differentiable).

Both share the same projection math (reference_renderer.project_gaussians)
so they agree numerically up to per-tile top-K truncation. A Pallas blend
kernel was built and removed: with trustworthy (scalar-fetch) timing it lost
to the XLA blend on both translucent and opaque scenes (docs/BENCH_NOTES.md,
round 2) — XLA's fusion of this bandwidth-bound blend is already optimal.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp

from ..ops.quaternion import build_covariance
from ..ops.rasterize.binning import bin_gaussians
from ..ops.rasterize.xla_blend import blend_tiles, blend_tiles_multiround
from ..ops.sh import rgb_from_sh_dc
from ..representations.camera import Camera
from ..representations.gaussians import GaussianSplat
from . import reference_renderer as rr


@flax.struct.dataclass
class RenderOptions:
    near: float = flax.struct.field(pytree_node=False, default=0.8)
    far: float = flax.struct.field(pytree_node=False, default=1.6)
    bg_color: tuple = flax.struct.field(pytree_node=False, default=(1.0, 1.0, 1.0))
    use_mip: bool = flax.struct.field(pytree_node=False, default=True)
    kernel_size_2d: float = flax.struct.field(pytree_node=False, default=0.1)
    ssaa: int = flax.struct.field(pytree_node=False, default=1)
    backend: str = flax.struct.field(pytree_node=False, default="binned")
    tile: int = flax.struct.field(pytree_node=False, default=32)
    max_per_tile: int = flax.struct.field(pytree_node=False, default=256)
    rounds: int = flax.struct.field(pytree_node=False, default=1)
    early_exit: bool = flax.struct.field(pytree_node=False, default=False)


class GaussianRenderer:
    def __init__(self, options: Optional[RenderOptions] = None):
        self.options = options or RenderOptions()

    def render(
        self,
        gs: GaussianSplat,
        camera: Camera,
        delta: Optional[jnp.ndarray] = None,
        detach_static: bool = False,
        valid: Optional[jnp.ndarray] = None,
        override_color: Optional[jnp.ndarray] = None,
        bg_color: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Render one splat set from one camera -> dict(render, depth, alpha).

        `delta` [N, 14] applies the variation field
        (Δxyz|Δscale|Δrot|ΔSH|Δopacity — reference gaussian_render.py:154-160).
        """
        opt = self.options
        cam = camera.replace(
            near=opt.near, far=opt.far,
            height=camera.height * opt.ssaa, width=camera.width * opt.ssaa,
        )
        bg = jnp.asarray(
            bg_color if bg_color is not None else opt.bg_color, jnp.float32
        )

        if opt.backend == "reference":
            out = rr.render(
                gs, cam, bg_color=bg, delta=delta, detach_static=detach_static,
                valid=valid, mip=opt.use_mip, kernel_size_2d=(
                    opt.kernel_size_2d if opt.use_mip else 0.3
                ),
                override_color=override_color,
            )
            return self._downsample(out, opt.ssaa)

        xyz, scaling, rotation, colors, opac0 = self._activate(
            gs, delta, detach_static, override_color
        )
        out = self._render_activated(
            xyz, scaling, rotation, colors, opac0, cam, bg, valid
        )
        return self._downsample(out, opt.ssaa)

    @staticmethod
    def _activate(gs, delta, detach_static, override_color):
        """Camera-independent attribute activation (shared across views)."""
        if delta is not None:
            attrs = gs.apply_variation(delta, detach_static=detach_static)
            xyz, scaling, rotation = attrs["xyz"], attrs["scaling"], attrs["rotation"]
            features, opacity = attrs["features"], attrs["opacity"]
        else:
            xyz, scaling, rotation = gs.get_xyz, gs.get_scaling, gs.get_rotation
            features, opacity = gs.get_features, gs.get_opacity
        colors = (
            rgb_from_sh_dc(features[..., 0, :])
            if override_color is None else override_color
        )
        return xyz, scaling, rotation, colors, opacity[..., 0]

    def _render_activated(self, xyz, scaling, rotation, colors, opac0, cam,
                          bg, valid, cov3d=None):
        """Per-camera projection + binning + blend on activated attributes."""
        opt = self.options
        proj = rr.project_gaussians(
            xyz, scaling, rotation, cam,
            kernel_size_2d=opt.kernel_size_2d if opt.use_mip else 0.3,
            mip=opt.use_mip, cov3d=cov3d,
        )
        opac = opac0 * proj["compensation"]
        v = proj["in_front"]
        if valid is not None:
            v = jnp.logical_and(v, valid)

        if opt.rounds > 1:
            rgb, dep, acc = blend_tiles_multiround(
                proj["mean2d"], proj["cov2d"], colors, opac, proj["depth"], v,
                cam.height, cam.width, bg, tile=opt.tile,
                per_round=opt.max_per_tile, rounds=opt.rounds,
                early_exit=opt.early_exit,
            )
        else:
            binned = bin_gaussians(
                proj["mean2d"], proj["cov2d"], colors, opac, proj["depth"], v,
                cam.height, cam.width, tile=opt.tile,
                max_per_tile=opt.max_per_tile,
            )
            rgb, dep, acc = blend_tiles(binned, cam.height, cam.width, bg)
        return {"render": rgb, "depth": dep, "alpha": acc}

    def render_views(
        self,
        gs: GaussianSplat,
        world_views: jnp.ndarray,   # [V, 4, 4] w2c per view
        intrinsics: jnp.ndarray,    # [V, 3, 3] (or [3, 3] shared)
        height: int,
        width: int,
        delta: Optional[jnp.ndarray] = None,
        detach_static: bool = False,
        valid: Optional[jnp.ndarray] = None,
        override_color: Optional[jnp.ndarray] = None,
        bg_color: Optional[jnp.ndarray] = None,
        chunk: int = 8,
    ) -> Dict[str, jnp.ndarray]:
        """Batched multi-view render: ONE program maps projection + binning +
        blend over V cameras while the delta application + color activation
        run once and are shared. The reference sweeps views with one CUDA
        render call each (utils/inference_utils.py:209-306); on TPU a batched
        program amortizes the per-dispatch floor (~25 ms on the tunneled
        backend) and the per-view work stays identical. `chunk` bounds the
        per-step memory of the lax.map over views."""
        opt = self.options
        V = world_views.shape[0]
        if intrinsics.ndim == 2:
            intrinsics = jnp.broadcast_to(intrinsics, (V, 3, 3))
        cam0 = Camera(
            world_view=world_views[0], intrinsics=intrinsics[0],
            height=height * opt.ssaa, width=width * opt.ssaa,
            near=opt.near, far=opt.far,
        )
        bg = jnp.asarray(
            bg_color if bg_color is not None else opt.bg_color, jnp.float32
        )
        xyz, scaling, rotation, colors, opac0 = self._activate(
            gs, delta, detach_static, override_color
        )
        # the world-space covariance is the view-independent half of the
        # projection: build it ONCE here instead of per lax.map step
        cov3d = build_covariance(scaling, rotation)

        def one(wv_intr):
            wv, intr = wv_intr
            cam = cam0.replace(world_view=wv, intrinsics=intr)
            out = self._render_activated(
                xyz, scaling, rotation, colors, opac0, cam, bg, valid,
                cov3d=cov3d,
            )
            return self._downsample(out, opt.ssaa)

        return jax.lax.map(
            one, (world_views, intrinsics), batch_size=min(chunk, V)
        )

    @staticmethod
    def _downsample(out: Dict[str, jnp.ndarray], ssaa: int):
        if ssaa == 1:
            return out
        def ds(a):
            c = a[..., None] if a.ndim == 2 else a
            h, w = c.shape[0] // ssaa, c.shape[1] // ssaa
            c = c.reshape(h, ssaa, w, ssaa, -1).mean(axis=(1, 3))
            return c[..., 0] if a.ndim == 2 else c
        return {k: ds(v) for k, v in out.items()}


def render_multiview(
    renderer: GaussianRenderer,
    gs: GaussianSplat,
    cameras,
    delta: Optional[jnp.ndarray] = None,
    **kw,
):
    """Render a list/stack of cameras; returns stacked dict."""
    outs = [renderer.render(gs, cam, delta=delta, **kw) for cam in cameras]
    return {k: jnp.stack([o[k] for o in outs]) for k in outs[0]}
