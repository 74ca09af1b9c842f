"""Octree primitive renderers: voxel / gaussian / trivec / decoupoly.

TPU-native re-design of the reference's diffoctreerast-backed OctreeRenderer
(trellis/renderers/octree_renderer.py:39-162, payloads defined in
trellis/representations/octree/octree_dfs.py:81-112). Where the CUDA
rasterizers walk the DFS structure array per ray, here a dense leaf-index
grid (representations/octree.leaf_index_grid) makes every field query an
O(1) gather, and one shared ray-marching compositor (render_volume) handles
all four primitives — static shapes, scan-based, differentiable.

Primitive semantics (matching octree_dfs.setup_functions, :116-120):
  voxel     constant density exp(x-2) per leaf (or `solid`), SH color
  gaussian  isotropic blob per leaf, opacity sigmoid(x-6)
  trivec    rank CP products (identity density activation + density_shift)
  decoupoly rank direction-polynomials, density exp(x-2) + density_shift
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import flax.struct
import jax
import jax.numpy as jnp

from ..ops.sh import eval_sh, rgb_from_sh_dc
from ..representations.camera import Camera
from ..representations.octree import (DecoupolyOctree, GaussianOctree,
                                      Strivec, VoxelOctree, leaf_index_grid,
                                      lookup_leaf, lookup_leaf_local,
                                      sample_trivec_taps)
from .volume_renderer import render_volume

OctreePayload = Union[VoxelOctree, GaussianOctree, Strivec, DecoupolyOctree]

# Density assigned to solid voxels (reference octree_dfs.py:149 uses 1000).
_SOLID_DENSITY = 1000.0
# Gaussian-blob std as a fraction of the cell half-extent.
_GAUSS_STD_FRAC = 0.5


def _leaf_colors(colors_dc, colors_ac, leaf, dirs, colors_overwrite):
    """Per-point RGB from SH coefficients (deg 0 fast path) or an override."""
    if colors_overwrite is not None:
        return colors_overwrite[leaf]
    if colors_ac is None:
        return rgb_from_sh_dc(colors_dc[leaf])
    sh = jnp.concatenate([colors_dc[:, None, :], colors_ac], axis=1)  # [N,S,3]
    deg = int(round(sh.shape[1] ** 0.5)) - 1
    return jnp.clip(eval_sh(deg, sh[leaf], dirs) + 0.5, 0.0, 1.0)


def _rank_color(colors, weights, leaf, colors_overwrite):
    """Contribution-weighted blend of per-rank colors [N,rank,3]."""
    if colors_overwrite is not None:
        return colors_overwrite[leaf]
    w = jnp.maximum(weights, 0.0)
    denom = jnp.sum(w, axis=-1, keepdims=True) + 1e-8
    return jnp.sum(w[..., None] * colors[leaf], axis=1) / denom


def make_field(
    oct: OctreePayload,
    used_rank: Optional[int] = None,
    colors_overwrite: Optional[jnp.ndarray] = None,
):
    """Build `field(points [P,3], dirs [P,3]) -> (sigma [P], rgb [P,3])` for
    any octree payload. Points are in the octree's [0,1] normalized cube."""
    tree = oct.tree
    grid = leaf_index_grid(tree)

    if isinstance(oct, VoxelOctree):
        def field(points, dirs):
            leaf, _ = lookup_leaf(grid, points)
            hit = leaf >= 0
            safe = jnp.maximum(leaf, 0)
            if oct.solid:
                sigma = jnp.where(hit, _SOLID_DENSITY, 0.0)
            else:
                sigma = jnp.where(hit, jnp.exp(oct.density[safe] - 2.0), 0.0)
            rgb = _leaf_colors(oct.colors_dc, oct.colors_ac, safe, dirs,
                               colors_overwrite)
            return sigma, rgb

    elif isinstance(oct, GaussianOctree):
        # Isotropic blob: sigma(p) = -log(1-o)*res * exp(-0.5 ||p-c||^2/std^2)
        # so a ray through the center accumulates alpha ~= o over one cell —
        # the capability analog of OctreeGaussianRasterizer's splat. res is
        # the LEAF's resolution (2^depth): coarse leaves have bigger cells,
        # so per-cell opacity means a proportionally smaller per-unit sigma.
        peak = -jnp.log1p(-jnp.clip(jax.nn.sigmoid(oct.opacity - 6.0),
                                    0.0, 0.9999))

        def field(points, dirs):
            leaf, rel, res = lookup_leaf_local(grid, tree, points)
            hit = leaf >= 0
            safe = jnp.maximum(leaf, 0)
            d2 = jnp.sum((rel - 0.5) ** 2, axis=-1)  # leaf units^2
            kern = jnp.exp(-0.5 * d2 / (_GAUSS_STD_FRAC * 0.5) ** 2)
            sigma = jnp.where(hit, peak[safe] * res * kern, 0.0)
            rgb = _leaf_colors(oct.colors_dc, oct.colors_ac, safe, dirs,
                               colors_overwrite)
            return sigma, rgb

    elif isinstance(oct, Strivec):
        tv = oct.trivec if used_rank is None else oct.trivec[:, :used_rank]
        dn = oct.density if used_rank is None else oct.density[:, :used_rank]
        cl = oct.colors if used_rank is None else oct.colors[:, :used_rank]

        def field(points, dirs):
            leaf, rel, res = lookup_leaf_local(grid, tree, points)
            hit = leaf >= 0
            safe = jnp.maximum(leaf, 0)
            prod = sample_trivec_taps(tv, safe, rel)   # [P, rank]
            contrib = dn[safe] * prod                   # identity activation
            sigma = jax.nn.relu(jnp.sum(contrib, -1) + oct.density_shift)
            sigma = jnp.where(hit, sigma * res, 0.0)
            rgb = _rank_color(cl, contrib, safe, colors_overwrite)
            return sigma, rgb

    elif isinstance(oct, DecoupolyOctree):
        vn = oct.V / (jnp.linalg.norm(oct.V, axis=-1, keepdims=True) + 1e-8)
        if used_rank is not None:
            vn, g_, dn, cl = (vn[:, :used_rank], oct.g[:, :used_rank],
                              oct.density[:, :used_rank],
                              oct.colors[:, :used_rank])
        else:
            g_, dn, cl = oct.g, oct.density, oct.colors
        degree = g_.shape[-1]

        def field(points, dirs):
            leaf, rel, res = lookup_leaf_local(grid, tree, points)
            hit = leaf >= 0
            safe = jnp.maximum(leaf, 0)
            local = rel * 2.0 - 1.0                     # [-1,1] leaf coords
            t = jnp.einsum("prd,pd->pr", vn[safe], local)  # [P, rank]
            poly = jnp.zeros_like(t)
            for d in range(degree - 1, -1, -1):         # Horner, static unroll
                poly = poly * t + g_[safe][..., d]
            contrib = jnp.exp(dn[safe] - 2.0) * jax.nn.relu(poly)
            sigma = jnp.where(
                hit,
                jax.nn.relu(jnp.sum(contrib, -1) + oct.density_shift) * res,
                0.0,
            )
            rgb = _rank_color(cl, contrib, safe, colors_overwrite)
            return sigma, rgb

    else:
        raise ValueError(f"unknown octree payload {type(oct).__name__}")

    return field


@flax.struct.dataclass
class OctreeRenderOptions:
    near: float = flax.struct.field(pytree_node=False, default=0.8)
    far: float = flax.struct.field(pytree_node=False, default=1.6)
    num_steps: int = flax.struct.field(pytree_node=False, default=128)
    ssaa: int = flax.struct.field(pytree_node=False, default=1)
    bg_color: tuple = flax.struct.field(pytree_node=False, default=(0.0, 0.0, 0.0))
    used_rank: Optional[int] = flax.struct.field(pytree_node=False, default=None)


class OctreeRenderer:
    """Primitive-dispatching octree renderer (reference
    trellis/renderers/octree_renderer.py:165-300). Returns color/depth/alpha
    (+ percent_depth for trivec, mirroring OctreeTrivecRasterizer's extra
    output, :128-140). The octree lives in the [0,1] cube centered like the
    reference's default aabb [0,0,0,1,1,1]; cameras look at (0.5, 0.5, 0.5).
    """

    def __init__(self, options: Optional[OctreeRenderOptions] = None):
        self.options = options or OctreeRenderOptions()

    def render(
        self,
        oct: OctreePayload,
        camera: Camera,
        colors_overwrite: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        o = self.options
        field = make_field(oct, used_rank=o.used_rank,
                           colors_overwrite=colors_overwrite)
        cam = camera
        if o.ssaa > 1:
            cam = camera.replace(height=camera.height * o.ssaa,
                                 width=camera.width * o.ssaa)
        want_pd = isinstance(oct, Strivec)
        # rank payloads gather [P, rank, 3, dim] per sample — bound the
        # vectorized march's per-chunk sample count accordingly
        chunk = 1024 if isinstance(oct, (Strivec, DecoupolyOctree)) else 4096
        out = render_volume(
            field, cam, num_steps=o.num_steps, t_near=o.near, t_far=o.far,
            bg_color=o.bg_color, field_takes_dirs=True,
            track_median_depth=want_pd, step_chunk=chunk,
        )
        if o.ssaa > 1:
            s = o.ssaa
            down = lambda img: jax.image.resize(
                img, (camera.height, camera.width) + img.shape[2:], "linear"
            )
            out = {k: down(v) for k, v in out.items()}
        ret = {"color": out["render"], "depth": out["depth"],
               "alpha": out["alpha"]}
        if want_pd:
            ret["percent_depth"] = out["median_depth"]
        return ret
