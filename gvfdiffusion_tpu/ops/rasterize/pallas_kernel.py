"""Pallas TPU forward rasterization kernel.

One grid program per 32x32 tile; the tile's K binned Gaussians stream from
VMEM while 1024 pixels live in an (8, 128) register tile (VPU-shaped). The
K-loop carries transmittance and accumulators in registers — nothing of size
[pixels x K] ever materializes (the XLA training path pays that inside a
tile chunk; this kernel is the inference fast path).

Inputs come pre-binned and depth-sorted from binning.bin_gaussians.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import BinnedGaussians

_SUB, _LANE = 8, 128  # pixel register tile: 8*128 = 1024 = 32*32 pixels


_BK = 8  # gaussians blended per outer iteration (v2: blocked K-loop)


def _tile_kernel(mean_ref, conic_ref, color_ref, opac_ref, depth_ref,
                 rgb_ref, depth_out_ref, alpha_ref, *, tile, n_tx):
    i = pl.program_id(0)
    oy = (i // n_tx) * tile
    ox = (i % n_tx) * tile

    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0) * _LANE
        + jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
    )
    px = (ox + lin % tile).astype(jnp.float32) + 0.5
    py = (oy + lin // tile).astype(jnp.float32) + 0.5

    k_max = mean_ref.shape[1]

    def body(kb, carry):
        t, r, g, b, d = carry

        def compute(_):
            # one vector load per attribute block instead of 5*_BK scalar
            # VMEM loads; per-gaussian values come from register extracts
            k0 = kb * _BK
            mb = mean_ref[0, pl.ds(k0, _BK), :]    # [_BK, 2]
            cb_ = conic_ref[0, pl.ds(k0, _BK), :]  # [_BK, 3]
            col = color_ref[0, pl.ds(k0, _BK), :]  # [_BK, 3]
            ob = opac_ref[0, pl.ds(k0, _BK), 0]    # [_BK]
            db = depth_ref[0, pl.ds(k0, _BK), 0]
            tt, rr, gg, bb, dd = t, r, g, b, d
            for j in range(_BK):  # unrolled: sequential blend in registers
                dx = px - mb[j, 0]
                dy = py - mb[j, 1]
                power = (
                    -0.5 * (cb_[j, 0] * dx * dx + cb_[j, 2] * dy * dy)
                    - cb_[j, 1] * dx * dy
                )
                alpha = jnp.minimum(
                    0.99, ob[j] * jnp.exp(jnp.minimum(power, 0.0))
                )
                alpha = jnp.where(power > 0.0, 0.0, alpha)
                alpha = jnp.where(alpha < 1.0 / 255.0, 0.0, alpha)
                w = alpha * tt
                rr = rr + w * col[j, 0]
                gg = gg + w * col[j, 1]
                bb = bb + w * col[j, 2]
                dd = dd + w * db[j]
                tt = tt * (1.0 - alpha)
            return tt, rr, gg, bb, dd

        # transmittance early-exit: once the tile is saturated, skip blocks
        return jax.lax.cond(
            jnp.max(t) > 1e-4, compute, lambda _: (t, r, g, b, d), None
        )

    ones = jnp.ones((_SUB, _LANE), jnp.float32)
    zeros = jnp.zeros((_SUB, _LANE), jnp.float32)
    t, r, g, b, d = jax.lax.fori_loop(
        0, k_max // _BK, body, (ones, zeros, zeros, zeros, zeros)
    )
    rgb_ref[0, 0] = r
    rgb_ref[0, 1] = g
    rgb_ref[0, 2] = b
    depth_out_ref[0, 0] = d
    alpha_ref[0, 0] = 1.0 - t


def rasterize_pallas(
    binned: BinnedGaussians, height: int, width: int, bg_color: jnp.ndarray
):
    """Forward-only Pallas rasterization. Returns (rgb, depth, alpha)."""
    tile = binned.tile
    assert tile * tile == _SUB * _LANE, "kernel is specialized to 32x32 tiles"
    n_ty, n_tx = binned.n_tiles_y, binned.n_tiles_x
    n_tiles = n_ty * n_tx

    opac = jnp.where(binned.mask, binned.opacity, 0.0)
    # pad K to the kernel's block size (padding has opacity 0 -> no-op blend)
    k_raw = binned.mean2d.shape[1]
    pad = (-k_raw) % _BK
    if pad:
        padk = lambda a: jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
        binned = binned._replace(
            mean2d=padk(binned.mean2d), conic=padk(binned.conic),
            color=padk(binned.color), depth=padk(binned.depth),
        )
        opac = padk(opac)
    k = binned.mean2d.shape[1]

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, k, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, _SUB, _LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    def kernel(mean_ref, conic_ref, color_ref, opac_ref, depth_ref,
               rgb_ref, dep_ref, alpha_ref):
        _tile_kernel(
            mean_ref, conic_ref, color_ref, opac_ref, depth_ref,
            rgb_ref, dep_ref, alpha_ref, tile=tile, n_tx=n_tx,
        )

    rgb_t, dep_t, acc_t = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 3, _SUB, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, _SUB, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, _SUB, _LANE), jnp.float32),
        ],
        grid_spec=grid_spec,
    )(
        binned.mean2d,
        binned.conic,
        binned.color,
        opac[..., None],
        binned.depth[..., None],
    )

    def stitch(a, c):
        # [T, c, 8, 128] -> [T, c, tile*tile] -> [H, W, c]
        a = a.reshape(n_tiles, c, tile * tile)
        a = a.transpose(0, 2, 1).reshape(n_ty, n_tx, tile, tile, c)
        a = a.transpose(0, 2, 1, 3, 4).reshape(n_ty * tile, n_tx * tile, c)
        return a[:height, :width]

    rgb = stitch(rgb_t, 3)
    rgb = rgb + (1.0 - stitch(acc_t, 1)) * bg_color
    return rgb, stitch(dep_t, 1)[..., 0], stitch(acc_t, 1)[..., 0]
