"""Tile binning for 3DGS rasterization — static-shape TPU design.

The CUDA rasterizers (diff-gaussian-rasterization, used by the reference at
renderers/gaussian_render.py:105-143) build dynamic per-tile duplicate lists
and sort by (tile, depth). Dynamic lists don't exist under XLA; instead each
tile selects its top-K nearest (front-most) intersecting Gaussians with
`top_k` over a masked depth key:

  1. project all N Gaussians (render/reference_renderer.project_gaussians)
  2. conservative screen-space radius = 3 * sqrt(max eigenvalue of cov2d)
  3. tile x gaussian intersection test against each tile's pixel rect
  4. per tile: top_k by (-depth where intersecting else -inf) -> [T, K]

K caps per-tile blending work. Overflow beyond K drops the FARTHEST
Gaussians (the ones most likely occluded anyway). Cost of the [T, N]
intersection matrix is a couple of fused VPU ops per entry — negligible next
to the blend.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BinnedGaussians(NamedTuple):
    """Per-tile gathered gaussian data, depth-sorted front-to-back."""

    mean2d: jnp.ndarray   # [T, K, 2]
    conic: jnp.ndarray    # [T, K, 3] (a, b, c) of inverse cov
    color: jnp.ndarray    # [T, K, 3]
    opacity: jnp.ndarray  # [T, K]
    depth: jnp.ndarray    # [T, K]
    mask: jnp.ndarray     # [T, K] bool — real entry
    n_tiles_y: int
    n_tiles_x: int
    tile: int


def compute_radius(cov2d: jnp.ndarray) -> jnp.ndarray:
    """3-sigma radius from the larger eigenvalue of [N, 2, 2] covariances."""
    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] ** 2
    lam1 = mid + jnp.sqrt(jnp.maximum(mid**2 - det, 0.1))
    return jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))


def intersect_tiles(
    mean2d: jnp.ndarray,    # [N, 2] px
    cov2d: jnp.ndarray,     # [N, 2, 2]
    opacities: jnp.ndarray,  # [N]
    valid: jnp.ndarray,     # [N]
    height: int,
    width: int,
    tile: int = 32,
):
    """Conservative gaussian-disc vs tile-rect intersection. Returns
    (inter [T, N] bool, conic [N, 3], n_ty, n_tx)."""
    n_ty = -(-height // tile)
    n_tx = -(-width // tile)

    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0]
    det = jnp.maximum(det, 1e-12)
    conic = jnp.stack(
        [cov2d[:, 1, 1] / det, -cov2d[:, 0, 1] / det, cov2d[:, 0, 0] / det], -1
    )
    radius = compute_radius(cov2d)
    ok = valid & (radius > 0) & (opacities > 1.0 / 255.0)

    ty = jnp.arange(n_ty) * tile
    tx = jnp.arange(n_tx) * tile
    y0 = jnp.repeat(ty, n_tx)        # [T]
    x0 = jnp.tile(tx, n_ty)          # [T]

    gx, gy = mean2d[:, 0], mean2d[:, 1]
    nearest_x = jnp.clip(gx[None, :], x0[:, None], (x0 + tile)[:, None])
    nearest_y = jnp.clip(gy[None, :], y0[:, None], (y0 + tile)[:, None])
    d2 = (nearest_x - gx[None, :]) ** 2 + (nearest_y - gy[None, :]) ** 2
    inter = (d2 <= (radius[None, :] ** 2)) & ok[None, :]  # [T, N]
    return inter, conic, n_ty, n_tx


def select_front(inter, depths, cursor_d, cursor_i, k):
    """Per tile, pick the k front-most intersecting gaussians strictly behind
    the lexicographic (depth, index) cursor — the multi-round work-list:
    the cursor advances past what previous rounds blended. The index tiebreak
    matters: coincident depths are common (e.g. per-voxel gaussian groups at
    zero-init offsets), and a depth-only cursor would drop ties that straddle
    a round boundary. `lax.top_k` breaks ties toward lower indices, so the
    taken set is exactly the k lexicographically-smallest (depth, index)
    candidates, and the new cursor is the largest taken pair.

    inter [T', N], depths [N], cursor_d/cursor_i [T'] ->
    (idx [T', k], mask [T', k], new_cursor_d [T'], new_cursor_i [T'])."""
    d = depths[None, :]
    i = jnp.arange(depths.shape[0])[None, :]
    cand = inter & (
        (d > cursor_d[:, None])
        | ((d == cursor_d[:, None]) & (i > cursor_i[:, None]))
    )
    key = jnp.where(cand, -d, -jnp.inf)
    neg_depth, idx = jax.lax.top_k(key, k)  # ascending depth, then index
    mask = jnp.isfinite(neg_depth)
    taken_d = jnp.where(mask, -neg_depth, -jnp.inf)
    d_max = jnp.max(taken_d, axis=-1)
    i_max = jnp.max(jnp.where(taken_d == d_max[:, None], idx, -1), axis=-1)
    any_taken = jnp.any(mask, axis=-1)
    new_d = jnp.where(any_taken, d_max, cursor_d)
    new_i = jnp.where(any_taken, i_max, cursor_i)
    return idx, mask, new_d, new_i


def bin_gaussians(
    mean2d: jnp.ndarray,    # [N, 2] px
    cov2d: jnp.ndarray,     # [N, 2, 2]
    colors: jnp.ndarray,    # [N, 3]
    opacities: jnp.ndarray,  # [N]
    depths: jnp.ndarray,    # [N]
    valid: jnp.ndarray,     # [N]
    height: int,
    width: int,
    tile: int = 32,
    max_per_tile: int = 256,
) -> BinnedGaussians:
    inter, conic, n_ty, n_tx = intersect_tiles(
        mean2d, cov2d, opacities, valid, height, width, tile
    )
    max_per_tile = min(max_per_tile, mean2d.shape[0])
    cursor_d = jnp.full((inter.shape[0],), -jnp.inf)
    cursor_i = jnp.full((inter.shape[0],), -1)
    idx, mask, _, _ = select_front(inter, depths, cursor_d, cursor_i,
                                   max_per_tile)
    take = lambda a: jnp.take(a, idx, axis=0)
    return BinnedGaussians(
        mean2d=take(mean2d),
        conic=take(conic),
        color=take(colors),
        opacity=jnp.where(mask, take(opacities), 0.0),
        depth=take(depths),
        mask=mask,
        n_tiles_y=n_ty,
        n_tiles_x=n_tx,
        tile=tile,
    )
