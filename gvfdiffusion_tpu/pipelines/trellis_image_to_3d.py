"""TRELLIS image -> 3D pipeline: canonical static GS generation.

Re-design of reference trellis/pipelines/trellis_image_to_3d.py:18-284:

  1. preprocess: background removal + bbox crop + 518^2 resize (host-side;
     rembg/u2net is an external model — a caller-provided `matting_fn`
     plugs in, with an alpha-channel fallback)
  2. DINOv2 conditioning tokens (models/dinov2.py)
  3. sparse-structure flow sampling: 12 Euler steps, CFG 7.5 ->
     16^3x8 latent -> conv decode -> occupied 64^3 coords
  4. SLat flow sampling on those coords (12 steps, CFG 3, guidance
     interval), slat normalization
  5. SLat GS decoder -> canonical GaussianSplat

Every sampling stage is one jitted lax.scan (diffusion/flow_euler.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.flow_euler import FlowEulerGuidanceIntervalSampler
from ..models.dinov2 import DinoV2, encode_image
from ..models.trellis.slat_decoders import SLatGaussianDecoder
from ..models.trellis.slat_flow import SLatFlowModel
from ..models.trellis.ss_flow import SparseStructureFlowModel
from ..models.trellis.ss_vae import SparseStructureDecoder
from ..sparse.tensor import SparseVoxels, from_dense


@dataclasses.dataclass
class TrellisConfig:
    ss_steps: int = 12
    ss_cfg: float = 7.5
    slat_steps: int = 12
    slat_cfg: float = 3.0
    slat_cfg_interval: tuple = (0.5, 1.0)
    ss_resolution: int = 16
    grid_resolution: int = 64
    voxel_capacity: int = 32768
    rescale_t: float = 3.0


class TrellisImageTo3DPipeline:
    def __init__(
        self,
        dinov2: DinoV2, dinov2_params: Any,
        ss_flow: SparseStructureFlowModel, ss_flow_params: Any,
        ss_decoder: SparseStructureDecoder, ss_decoder_params: Any,
        slat_flow: SLatFlowModel, slat_flow_params: Any,
        slat_decoder: SLatGaussianDecoder, slat_decoder_params: Any,
        config: Optional[TrellisConfig] = None,
        slat_mean: Optional[jnp.ndarray] = None,
        slat_std: Optional[jnp.ndarray] = None,
        matting_fn: Optional[Callable] = None,
        slat_decoder_mesh: Any = None, slat_decoder_mesh_params: Any = None,
        slat_decoder_rf: Any = None, slat_decoder_rf_params: Any = None,
    ):
        self.dinov2, self.dinov2_params = dinov2, dinov2_params
        self.ss_flow, self.ss_flow_params = ss_flow, ss_flow_params
        self.ss_decoder, self.ss_decoder_params = ss_decoder, ss_decoder_params
        self.slat_flow, self.slat_flow_params = slat_flow, slat_flow_params
        self.slat_decoder, self.slat_decoder_params = slat_decoder, slat_decoder_params
        self.slat_decoder_mesh = slat_decoder_mesh
        self.slat_decoder_mesh_params = slat_decoder_mesh_params
        self.slat_decoder_rf = slat_decoder_rf
        self.slat_decoder_rf_params = slat_decoder_rf_params
        self.cfg = config or TrellisConfig()
        self.slat_mean = slat_mean
        self.slat_std = slat_std
        self.matting_fn = matting_fn

    # -- stage 1: preprocessing (host) --------------------------------------

    def preprocess_image(self, image: np.ndarray) -> np.ndarray:
        """[H, W, 3|4] uint8/float -> [518, 518, 3] float in [0,1], object
        centered with 1.2x bbox margin (reference :85-119)."""
        img = np.asarray(image).astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        if img.shape[-1] == 4:
            alpha = img[..., 3]
            rgb = img[..., :3]
        elif self.matting_fn is not None:
            alpha = np.asarray(self.matting_fn(img))
            rgb = img
        else:
            alpha = np.ones(img.shape[:2], np.float32)
            rgb = img
        ys, xs = np.where(alpha > 0.5)
        if len(ys) == 0:
            ys, xs = np.arange(img.shape[0]), np.arange(img.shape[1])
        cy, cx = (ys.min() + ys.max()) / 2, (xs.min() + xs.max()) / 2
        half = max(ys.max() - ys.min(), xs.max() - xs.min()) / 2 * 1.2
        y0, y1 = int(max(cy - half, 0)), int(min(cy + half, img.shape[0]))
        x0, x1 = int(max(cx - half, 0)), int(min(cx + half, img.shape[1]))
        crop = rgb[y0:y1, x0:x1] * alpha[y0:y1, x0:x1, None]
        out = jax.image.resize(jnp.asarray(crop), (518, 518, 3), "bilinear")
        return np.asarray(out)

    # -- stage 2: conditioning ----------------------------------------------

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        return encode_image(self.dinov2, self.dinov2_params, images)

    # -- stage 3: sparse structure -----------------------------------------

    def sample_sparse_structure(self, cond: jnp.ndarray, rng: jax.Array,
                                noise: Optional[jnp.ndarray] = None) -> SparseVoxels:
        """cond [B, L, C] -> occupied-voxel SparseVoxels at grid resolution
        (reference :165-196). `noise` overrides the random draw (golden
        tests inject the torch reference's noise)."""
        c = self.cfg
        B = cond.shape[0]
        r = c.ss_resolution
        in_ch = self.ss_flow.in_channels
        sampler = FlowEulerGuidanceIntervalSampler()
        if noise is None:
            noise = jax.random.normal(rng, (B, r, r, r, in_ch))

        def model(x, t, cc):
            return self.ss_flow.apply(self.ss_flow_params, x, t, cc)

        z = sampler.sample(
            model, noise, cond=cond, neg_cond=jnp.zeros_like(cond),
            steps=c.ss_steps, cfg_strength=c.ss_cfg, rescale_t=c.rescale_t,
        )["samples"]
        logits = self.ss_decoder.apply(self.ss_decoder_params, z)
        occupancy = (logits[..., 0] > 0).astype(jnp.float32)[..., None]
        return from_dense(occupancy, capacity=c.voxel_capacity, threshold=0.5)

    # -- stage 4: SLat ------------------------------------------------------

    def sample_slat(self, structure: SparseVoxels, cond: jnp.ndarray,
                    rng: jax.Array,
                    noise_feats: Optional[jnp.ndarray] = None) -> SparseVoxels:
        """Flow sampling of latent features on the occupied voxels
        (reference :222-255). `noise_feats` [B, L, C_in] overrides the
        random draw (golden tests inject the torch reference's noise)."""
        c = self.cfg
        in_ch = self.slat_flow.in_channels
        if noise_feats is None:
            noise_feats = jax.random.normal(
                rng, structure.feats.shape[:2] + (in_ch,)
            )
        noise = structure.replace(
            feats=noise_feats * structure.valid[..., None]
        )
        sampler = FlowEulerGuidanceIntervalSampler()

        def model(x_feats, t, cc):
            # batched-CFG passes 2B feats; tile the closed-over structure
            b = x_feats.shape[0]
            st = structure
            if b != structure.feats.shape[0]:
                rep = b // structure.feats.shape[0]
                st = structure.replace(
                    feats=jnp.tile(structure.feats, (rep, 1, 1)),
                    coords=jnp.tile(structure.coords, (rep, 1, 1)),
                    valid=jnp.tile(structure.valid, (rep, 1)),
                )
            x = st.replace(feats=x_feats * st.valid[..., None])
            out = self.slat_flow.apply(self.slat_flow_params, x, t, cc)
            return out.feats

        z = sampler.sample(
            model, noise.feats, cond=cond, neg_cond=jnp.zeros_like(cond),
            steps=c.slat_steps, cfg_strength=c.slat_cfg,
            cfg_interval=c.slat_cfg_interval, rescale_t=c.rescale_t,
        )["samples"]
        if self.slat_std is not None:
            z = z * self.slat_std
        if self.slat_mean is not None:
            z = z + self.slat_mean
        return structure.replace(feats=z * structure.valid[..., None])

    # -- stage 5: decode -----------------------------------------------------

    def decode_slat(self, slat: SparseVoxels):
        """-> (GaussianSplat [B, L*G], valid) (reference :198-220)."""
        return self.slat_decoder.apply(self.slat_decoder_params, slat)

    def decode_slat_formats(self, slat: SparseVoxels, formats=("gaussian",)):
        """Multi-format decode (reference :198-220): any of 'gaussian',
        'mesh', 'radiance_field' — the latter two need their decoders passed
        at construction."""
        ret = {}
        if "gaussian" in formats:
            ret["gaussian"] = self.decode_slat(slat)
        if "mesh" in formats:
            assert self.slat_decoder_mesh is not None, "no mesh decoder"
            ret["mesh"] = self.slat_decoder_mesh.apply(
                self.slat_decoder_mesh_params, slat
            )
        if "radiance_field" in formats:
            assert self.slat_decoder_rf is not None, "no RF decoder"
            ret["radiance_field"] = self.slat_decoder_rf.apply(
                self.slat_decoder_rf_params, slat
            )
        return ret

    # -- end-to-end ----------------------------------------------------------

    def run(
        self, image: np.ndarray, rng: jax.Array, formats=("gaussian",)
    ) -> Dict[str, Any]:
        pre = self.preprocess_image(image)
        cond = self.encode_image(jnp.asarray(pre)[None])
        k1, k2 = jax.random.split(rng)
        structure = self.sample_sparse_structure(cond, k1)
        slat = self.sample_slat(structure, cond, k2)
        decoded = self.decode_slat_formats(slat, formats)
        out = {"structure": structure, "slat": slat, "cond": cond}
        if "gaussian" in decoded:
            gs, valid = decoded["gaussian"]
            out.update(gaussians=gs, valid=valid)
        if "mesh" in decoded:
            out["mesh"] = decoded["mesh"]
        if "radiance_field" in decoded:
            out["radiance_field"] = decoded["radiance_field"]
        return out
