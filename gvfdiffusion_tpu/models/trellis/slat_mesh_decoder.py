"""SLat -> mesh decoder.

Capability re-design of trellis/models/structured_latent_vae/decoder_mesh.py:71
(SLatMeshDecoder: sparse transformer torso + subdivide upsampling +
FlexiCubes extraction): here the torso predicts per-voxel SDF corner values +
corner deformations on a subdivided grid, and ops/marching_tets.py extracts
the surface (DMTet-style — same differentiable mesh-from-features capability,
TPU-static shapes; documented deviation from FlexiCubes).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.flexicubes import flexicubes_dense
from ...ops.marching_tets import marching_tets_dense
from ...sparse.conv import SparseConv3d
from ...sparse.ops import (
    SparseGroupNorm,
    SparseLayerNorm,
    SparseLinear,
    sparse_silu,
    sparse_subdivide,
)
from ...sparse.tensor import SparseVoxels
from .slat_decoders import SparseTransformerBase


class SLatMeshDecoder(nn.Module):
    """Per-voxel 8 SDF corner values + 8x3 corner deformations."""

    resolution: int = 64
    model_channels: int = 768
    latent_channels: int = 8
    num_blocks: int = 12
    num_heads: Optional[int] = None
    mlp_ratio: float = 4.0
    attn_mode: str = "swin"
    window_size: int = 8
    pe_mode: str = "ape"
    qk_rms_norm: bool = False
    use_subdivide: bool = True
    # predict FlexiCubes-style per-corner interpolation weights (the
    # reference's learned extraction weights, flexicubes.py); returns a
    # 4-tuple (sdf, deform, alpha, res) instead of 3
    use_flexi_weights: bool = False
    # predict the full 21 per-cube FlexiCubes weights (beta 12 + alpha 8 +
    # gamma 1, reference cube2mesh.py:80-92 layout) for
    # ops/flexicubes.flexicubes_dense; returns (sdf, deform, weights, res).
    # Mutually exclusive with use_flexi_weights.
    flexicubes_weights: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels):
        """Returns (sdf_grid [B, R+1,R+1,R+1], deform_grid [B, R+1,R+1,R+1,3])
        ready for marching_tets_dense; R is the (possibly subdivided) res."""
        h = SparseTransformerBase(
            in_channels=self.latent_channels,
            model_channels=self.model_channels,
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            attn_mode=self.attn_mode,
            window_size=self.window_size,
            pe_mode=self.pe_mode,
            qk_rms_norm=self.qk_rms_norm,
            dtype=self.dtype,
            name="torso",
        )(x)
        if self.use_subdivide:
            h = SparseLinear(self.model_channels // 4, dtype=self.dtype,
                             name="pre_subdivide")(h)
            h = sparse_subdivide(h)
        assert not (self.use_flexi_weights and self.flexicubes_weights)
        h = SparseLayerNorm(affine=False, name="out_norm")(h)
        # 8 corners x (1 sdf + 3 deform [+ 1 flexi interp weight])
        # [+ 21 per-cube FlexiCubes weights]
        per_corner = 5 if self.use_flexi_weights else 4
        n_out = 8 * per_corner + (21 if self.flexicubes_weights else 0)
        out = SparseLinear(n_out, kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros, name="out_layer")(h)

        b, l, _ = out.feats.shape
        res = h.resolution
        vals = out.feats[..., : 8 * per_corner].reshape(b, l, 8, per_corner)
        sdf_c = vals[..., 0] - 0.1  # bias: empty space is outside
        deform_c = jnp.tanh(vals[..., 1:4]) * 0.5
        if self.use_flexi_weights:
            # FlexiCubes alpha (flexicubes.py learned weights): positive
            # multiplier on the field at each corner, 1.0 at zero-init
            alpha_c = jnp.exp(jnp.tanh(vals[..., 4]))

        # scatter corner values onto the (R+1)^3 grid (mean over contributors)
        corner_off = jnp.asarray(
            [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)],
            jnp.int32,
        )
        cpos = h.coords[:, :, None, :] + corner_off[None, None]  # [B, L, 8, 3]
        flat = (
            cpos[..., 0] * (res + 1) ** 2 + cpos[..., 1] * (res + 1) + cpos[..., 2]
        )
        flat = jnp.where(h.valid[..., None], flat, (res + 1) ** 3)

        def scatter(vals_b, flat_b):
            num = (res + 1) ** 3 + 1
            s = jnp.zeros((num,) + vals_b.shape[2:], vals_b.dtype)
            cnt = jnp.zeros((num,), vals_b.dtype)
            s = s.at[flat_b.reshape(-1)].add(vals_b.reshape(-1, *vals_b.shape[2:]))
            cnt = cnt.at[flat_b.reshape(-1)].add(1.0)
            mean = s / jnp.maximum(cnt, 1.0).reshape((-1,) + (1,) * (s.ndim - 1))
            return mean[:-1], cnt[:-1] > 0

        sdf_grid, occ = jax.vmap(scatter)(sdf_c, flat)
        deform_grid, _ = jax.vmap(scatter)(deform_c, flat)
        # corners never touched by any voxel: far outside
        sdf_grid = jnp.where(occ, sdf_grid, 1.0)
        n = res + 1
        if self.flexicubes_weights:
            # per-CUBE raw 21 weights scattered onto the [R^3] cell grid
            # (cells are unique per voxel: plain set; empty cells raw 0 ->
            # neutral beta/alpha=1, gamma=0.5 after normalize_weights)
            w_c = out.feats[..., 8 * per_corner:]  # [B, L, 21]
            cell = (
                h.coords[..., 0] * res * res
                + h.coords[..., 1] * res
                + h.coords[..., 2]
            )
            cell = jnp.where(h.valid, cell, res**3)

            def scatter_cells(w_b, cell_b):
                buf = jnp.zeros((res**3 + 1, 21), w_b.dtype)
                return buf.at[cell_b].set(w_b)[:-1]

            w_grid = jax.vmap(scatter_cells)(w_c, cell)
            return (
                sdf_grid.reshape(b, n, n, n),
                deform_grid.reshape(b, n, n, n, 3),
                w_grid.reshape(b, res, res, res, 21),
                res,
            )
        if self.use_flexi_weights:
            alpha_grid, _ = jax.vmap(scatter)(alpha_c, flat)
            alpha_grid = jnp.where(occ, alpha_grid, 1.0)
            return (
                sdf_grid.reshape(b, n, n, n),
                deform_grid.reshape(b, n, n, n, 3),
                alpha_grid.reshape(b, n, n, n),
                res,
            )
        return (
            sdf_grid.reshape(b, n, n, n),
            deform_grid.reshape(b, n, n, n, 3),
            res,
        )


class SparseSubdivideBlock3d(nn.Module):
    """Checkpoint-compatible subdivide block (reference decoder_mesh.py:13-68):
    GroupNorm32+SiLU -> subdivide -> conv3 -> GroupNorm32 -> SiLU -> zero-init
    conv3, plus a 1x1-conv skip over the subdivided input when channels change.
    """

    channels: int
    out_channels: Optional[int] = None
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels) -> SparseVoxels:
        out_ch = self.out_channels or self.channels
        h = SparseGroupNorm(self.num_groups, epsilon=1e-5, name="act_norm")(x)
        h = sparse_silu(h)
        h = sparse_subdivide(h)
        xs = sparse_subdivide(x)
        h = SparseConv3d(out_ch, 3, dtype=self.dtype, name="conv1")(h)
        h = SparseGroupNorm(self.num_groups, epsilon=1e-5, name="norm2")(h)
        h = sparse_silu(h)
        h = SparseConv3d(
            out_ch, 3, kernel_init=nn.initializers.zeros, dtype=self.dtype,
            name="conv2",
        )(h)
        if out_ch == self.channels:
            skip = xs.feats
        else:
            skip = SparseConv3d(out_ch, 1, dtype=self.dtype, name="skip")(xs).feats
        return h.replace_feats(h.feats + skip)


# cube2mesh.py:80-92 feature layout: 8 sdf + 8x3 deform [+ 8x6 color] + 21
# FlexiCubes weights, in that order
MESH_FEATS_CHANNELS = 8 + 24 + 21
MESH_FEATS_CHANNELS_COLOR = 8 + 24 + 48 + 21


class SLatMeshDecoderRef(nn.Module):
    """Checkpoint-compatible SLat mesh decoder (reference decoder_mesh.py:71-167
    SLatMeshDecoder): sparse-transformer torso at the latent resolution, two
    SparseSubdivideBlock3d upsamples (res -> 4*res, channels -> /8), then a
    zero-init linear head emitting the FlexiCubes feature layout
    (cube2mesh.py:80-92). `convert_slat_mesh_decoder` loads the released
    TRELLIS safetensors 1:1; decode with `sparse_features_to_mesh`.

    (`SLatMeshDecoder` above is the TPU re-design — corner-SDF head + marching
    tets at the torso resolution; this class is the parity path.)
    """

    resolution: int = 64
    model_channels: int = 768
    latent_channels: int = 8
    num_blocks: int = 12
    num_heads: Optional[int] = None
    mlp_ratio: float = 4.0
    attn_mode: str = "swin"
    window_size: int = 8
    pe_mode: str = "ape"
    qk_rms_norm: bool = False
    use_color: bool = False
    remat_blocks: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels) -> SparseVoxels:
        """Latent SparseVoxels [B, L, latent_channels] at `resolution` ->
        SparseVoxels [B, L*64, 53 or 101] at `resolution * 4`."""
        h = SparseTransformerBase(
            in_channels=self.latent_channels,
            model_channels=self.model_channels,
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            attn_mode=self.attn_mode,
            window_size=self.window_size,
            pe_mode=self.pe_mode,
            qk_rms_norm=self.qk_rms_norm,
            remat_blocks=self.remat_blocks,
            dtype=self.dtype,
            name="torso",
        )(x)
        h = SparseSubdivideBlock3d(
            channels=self.model_channels,
            out_channels=self.model_channels // 4,
            dtype=self.dtype,
            name="upsample_0",
        )(h)
        h = SparseSubdivideBlock3d(
            channels=self.model_channels // 4,
            out_channels=self.model_channels // 8,
            dtype=self.dtype,
            name="upsample_1",
        )(h)
        n_out = MESH_FEATS_CHANNELS_COLOR if self.use_color else MESH_FEATS_CHANNELS
        h = h.replace_feats(h.feats.astype(jnp.float32))
        return SparseLinear(
            n_out, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="out_layer",
        )(h)


def sparse_features_to_mesh(
    x: SparseVoxels,
    use_color: bool = False,
    training: bool = False,
):
    """cube2mesh.SparseFeatures2Mesh equivalent (reference cube2mesh.py:62-143).

    Splits the per-cube feature layout (sdf 8, deform 8x3, [color 8x6],
    weights 21), mean-scatters corner attributes onto the dense (R+1)^3
    vertex grid (cubes_to_verts reduce='mean'; untouched vertices get
    sdf=1 / outside, utils_cube.get_dense_attrs sdf_init), scatters the raw
    21 FlexiCubes weights onto the R^3 cell grid, and extracts with
    ops/flexicubes.flexicubes_dense. SDF bias = -1/R (cube2mesh.py:71);
    vertex positions follow get_defomed_verts: v/R - 0.5 +
    (1-1e-8)/(2R) * tanh(deform), i.e. meshes live in [-0.5, 0.5]^3.

    Returns a list (per batch element) of FlexiMesh — with a `colors` array
    appended per mesh when use_color (vertex colors trilinearly sampled at
    the dual vertices; documented deviation: the reference interpolates
    colors inside the FlexiCubes kernel).
    """
    res = x.resolution
    b, l, c = x.feats.shape
    exp = MESH_FEATS_CHANNELS_COLOR if use_color else MESH_FEATS_CHANNELS
    assert c == exp, f"expected {exp} channels, got {c}"
    n = res + 1

    corner_off = jnp.asarray(
        [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)],
        jnp.int32,
    )

    def one(feats_b, coords_b, valid_b):
        sdf_c = feats_b[:, :8] - 1.0 / res
        deform_c = feats_b[:, 8:32].reshape(l, 8, 3)
        if use_color:
            color_c = feats_b[:, 32:80].reshape(l, 8, 6)
            w_c = feats_b[:, 80:101]
        else:
            color_c = None
            w_c = feats_b[:, 32:53]

        cpos = coords_b[:, None, :] + corner_off[None]  # [L, 8, 3]
        flat = cpos[..., 0] * n * n + cpos[..., 1] * n + cpos[..., 2]
        flat = jnp.where(valid_b[:, None], flat, n**3)

        def scatter_mean(vals, fill0):
            nslots = n**3 + 1
            s = jnp.zeros((nslots,) + vals.shape[2:], vals.dtype)
            cnt = jnp.zeros((nslots,), vals.dtype)
            s = s.at[flat.reshape(-1)].add(vals.reshape(-1, *vals.shape[2:]))
            cnt = cnt.at[flat.reshape(-1)].add(1.0)
            mean = s / jnp.maximum(cnt, 1.0).reshape(
                (-1,) + (1,) * (s.ndim - 1))
            touched = cnt > 0
            fill = jnp.where(
                touched.reshape((-1,) + (1,) * (s.ndim - 1)), mean, fill0)
            return fill[:-1]

        sdf_d = scatter_mean(sdf_c[..., None], 1.0).reshape(n, n, n)
        deform_d = scatter_mean(deform_c, 0.0).reshape(n, n, n, 3)

        cell = (coords_b[:, 0] * res * res + coords_b[:, 1] * res
                + coords_b[:, 2])
        cell = jnp.where(valid_b, cell, res**3)
        w_d = jnp.zeros((res**3 + 1, 21), feats_b.dtype).at[cell].set(w_c)
        w_d = w_d[:-1].reshape(res, res, res, 21)

        # get_defomed_verts: offsets are tanh(deform) * (1-1e-8)/2 grid units
        cdef = jnp.tanh(deform_d) * ((1.0 - 1e-8) / 2.0)
        mesh = flexicubes_dense(sdf_d, cdef, w_d, grid_scale=1.0,
                                training=training)
        mesh = mesh._replace(verts=mesh.verts - 0.5)
        if use_color:
            color_d = scatter_mean(color_c, 0.0).reshape(n, n, n, 6)
            p = jnp.clip((mesh.verts + 0.5) * res, 0.0, res - 1e-6)
            p0 = jnp.floor(p).astype(jnp.int32)
            f = p - p0
            cols = jnp.zeros((mesh.verts.shape[0], 6), feats_b.dtype)
            for dz in range(2):
                for dy in range(2):
                    for dx in range(2):
                        q = jnp.minimum(p0 + jnp.asarray([dx, dy, dz]), res)
                        wgt = (
                            jnp.where(dx, f[:, 0], 1 - f[:, 0])
                            * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                            * jnp.where(dz, f[:, 2], 1 - f[:, 2])
                        )
                        cols = cols + wgt[:, None] * color_d[
                            q[:, 0], q[:, 1], q[:, 2]]
            return mesh, cols
        return mesh, None

    out = []
    for bi in range(b):
        mesh, cols = one(x.feats[bi], x.coords[bi], x.valid[bi])
        out.append((mesh, cols) if use_color else mesh)
    return out


def extract_mesh(sdf_grid, deform_grid, grid_scale: float = 1.0):
    """Batch helper: marching tets per sample -> list of padded meshes."""
    out = []
    for b in range(sdf_grid.shape[0]):
        out.append(
            marching_tets_dense(sdf_grid[b], deform_grid[b], grid_scale)
        )
    return out
