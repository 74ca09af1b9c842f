"""Differentiable tile blending in pure XLA.

Front-to-back alpha compositing of binned Gaussians, `lax.map`-chunked over
tiles so peak memory is O(chunk * tile_px * K) instead of O(pixels * N).
Fully autodiff-able — this is the TRAINING path replacing the CUDA
rasterizer's hand-written backward (the render losses at train_vae.py:321-334
backprop straight through this).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .binning import BinnedGaussians


def blend_tiles(
    binned: BinnedGaussians,
    height: int,
    width: int,
    bg_color: jnp.ndarray,
    tile_chunk: int = 16,
):
    """Returns (rgb [H, W, 3], depth [H, W], alpha [H, W])."""
    tile = binned.tile
    n_ty, n_tx = binned.n_tiles_y, binned.n_tiles_x
    n_tiles = n_ty * n_tx

    ty = jnp.repeat(jnp.arange(n_ty) * tile, n_tx)
    tx = jnp.tile(jnp.arange(n_tx) * tile, (n_ty,))

    # local pixel grid [tile*tile]
    py_loc = jnp.repeat(jnp.arange(tile, dtype=jnp.float32), tile) + 0.5
    px_loc = jnp.tile(jnp.arange(tile, dtype=jnp.float32), (tile,)) + 0.5

    def one_tile(args):
        mean2d, conic, color, opacity, depth, mask, oy, ox = args
        px = px_loc + ox  # [P]
        py = py_loc + oy
        dx = px[:, None] - mean2d[None, :, 0]  # [P, K]
        dy = py[:, None] - mean2d[None, :, 1]
        power = (
            -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy)
            - conic[None, :, 1] * dx * dy
        )
        alpha = jnp.minimum(0.99, opacity[None, :] * jnp.exp(jnp.minimum(power, 0.0)))
        alpha = jnp.where((power > 0.0) | ~mask[None, :], 0.0, alpha)
        alpha = jnp.where(alpha < 1.0 / 255.0, 0.0, alpha)
        t_before = jnp.cumprod(1.0 - alpha, axis=-1) / (1.0 - alpha + 1e-10)
        w = alpha * t_before  # [P, K]
        rgb = w @ color  # [P, 3]
        d = w @ depth[:, None]  # [P, 1]
        acc = jnp.sum(w, axis=-1)  # [P]
        rgb = rgb + (1.0 - acc[:, None]) * bg_color
        return rgb, d[:, 0], acc

    # chunk tiles through lax.map to bound live memory
    args = (
        binned.mean2d, binned.conic, binned.color, binned.opacity,
        binned.depth, binned.mask, ty.astype(jnp.float32), tx.astype(jnp.float32),
    )
    rgb, dep, acc = jax.lax.map(one_tile, args, batch_size=tile_chunk)

    # stitch tiles [T, P] -> [H, W]
    def stitch(a):
        c = a.shape[-1] if a.ndim == 3 else None
        if c is None:
            a = a[..., None]
            c = 1
        a = a.reshape(n_ty, n_tx, tile, tile, c)
        a = a.transpose(0, 2, 1, 3, 4).reshape(n_ty * tile, n_tx * tile, c)
        a = a[:height, :width]
        return a[..., 0] if c == 1 else a

    return stitch(rgb), stitch(dep), stitch(acc)
