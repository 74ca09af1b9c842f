"""Video -> 4D generation pipeline.

Re-design of the reference's inference_dpm_latent.py:41-273 (the north-star
path): given per-video conditioning (DINOv2 tokens + a canonical static GS
from the TRELLIS stage), sample the Gaussian-Variation-Field latent with a
CFG-wrapped DPM-Solver++, decode per-frame deltas with the motion VAE, and
render orbit sweeps.

TPU-first structure: the whole denoise (32 steps x 3-way CFG DiT) is one
jitted lax.scan; decoding and rendering are separately jitted so host-side
conditioning prep can overlap device compute across batch items.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.dpm_solver import DPMSolver, NoiseScheduleVP, model_wrapper
from ..diffusion.gaussian_diffusion import get_named_beta_schedule
from ..models.dit import DiT
from ..models.motion_vae import MotionVAE
from ..ops.fps import fps_masked
from ..render.renderer import GaussianRenderer, RenderOptions
from ..representations.camera import orbit_camera
from ..representations.gaussians import GaussianSplat


@dataclasses.dataclass
class VideoTo4DConfig:
    steps: int = 100           # respaced NFE budget (reference --rescale_timesteps 100)
    order: int = 2
    method: str = "multistep"  # or "adaptive"
    # reference inference_dpm_latent.py:310-311 defaults (1.0/1.0 selects the
    # single-conditional-pass CFG branch, model/dpmsolver.py:329-330)
    guidance_scale: float = 1.0
    guidance_scale2: float = 1.0
    noise_schedule: str = "cosine"
    diffusion_steps: int = 1000
    num_frames: int = 32
    num_latents: int = 512
    latent_dim: int = 16
    fps_anchor_points: int = 4096


class VideoTo4DPipeline:
    """Holds the DiT + motion VAE and their parameters."""

    def __init__(
        self,
        dit: DiT,
        dit_params: Any,
        motion_vae: MotionVAE,
        vae_params: Any,
        config: Optional[VideoTo4DConfig] = None,
        latent_mean: Optional[jnp.ndarray] = None,
        latent_std: Optional[jnp.ndarray] = None,
        render_options: Optional[RenderOptions] = None,
    ):
        self.dit = dit
        self.dit_params = dit_params
        self.vae = motion_vae
        self.vae_params = vae_params
        self.cfg = config or VideoTo4DConfig()
        # deformation latent normalization stats (reference
        # dataset/dataset_latent.py:113-119 / denorm at inference :250-257)
        self.latent_mean = latent_mean
        self.latent_std = latent_std
        betas = get_named_beta_schedule(
            self.cfg.noise_schedule, self.cfg.diffusion_steps
        )
        self.ns = NoiseScheduleVP.from_betas(betas)
        self.renderer = GaussianRenderer(render_options or RenderOptions())

    # -- conditioning prep --------------------------------------------------

    def prepare_static_conditioning(self, static_gs_activated: jnp.ndarray,
                                    valid: jnp.ndarray):
        """FPS-sample anchors for the DiT conditioning + positions
        (reference inference_dpm_latent.py:208-209 sample_gs)."""
        n_lat = self.cfg.num_latents
        idx = jax.vmap(lambda p, v: fps_masked(p, v, n_lat))(
            static_gs_activated[..., :3], valid
        )
        anchors = jnp.take_along_axis(static_gs_activated, idx[..., None], axis=1)
        return anchors  # [B, num_latents, 14]

    # -- sampling -----------------------------------------------------------

    def sample_deformation_latent(
        self,
        cond_images: jnp.ndarray,     # [B, T, L, 1024] DINOv2 tokens
        static_latent: jnp.ndarray,   # [B, num_latents, 14] FPS anchors
        positions: jnp.ndarray,       # [B, num_latents, 3]
        rng: jax.Array,
    ) -> jnp.ndarray:
        """Returns the denormalized deformation latent [B, T, N, C]."""
        cfg = self.cfg
        B, T = cond_images.shape[:2]

        cond = dict(
            cond_images=cond_images, static_latent=static_latent,
            positions=positions,
        )
        uncond = dict(
            cond_images=jnp.zeros_like(cond_images),
            static_latent=static_latent,
            positions=positions,
        )

        def raw_model(x, t, **kw):
            return self.dit.apply(
                self.dit_params, x, t, kw["cond_images"], kw["static_latent"],
                kw["positions"], cross_kv=kw.get("cross_kv"),
            )

        # precompute loop-invariant cross-attention KV for the 3-way CFG batch
        # (branch order matches model_wrapper: full-uncond / uncond / cond)
        cross_kv = None
        if cfg.guidance_scale != 1.0 or cfg.guidance_scale2 != 1.0:
            full_uncond = dict(
                uncond, static_latent=jnp.zeros_like(uncond["static_latent"])
            )
            c3 = {
                k: jnp.concatenate([full_uncond[k], uncond[k], cond[k]])
                for k in cond
            }
            cross_kv = self.dit.apply(
                self.dit_params,
                jnp.zeros((3 * B, T, cfg.num_latents, cfg.latent_dim)),
                jnp.zeros((3 * B,)),
                c3["cond_images"], c3["static_latent"], c3["positions"],
                kv_only=True,
            )

        model_fn = model_wrapper(
            raw_model, self.ns, model_type="v",
            guidance_type="classifier-free", condition=cond,
            unconditional_condition=uncond,
            guidance_scale=cfg.guidance_scale,
            guidance_scale2=cfg.guidance_scale2,
            cross_kv=cross_kv,
        )
        solver = DPMSolver(model_fn, self.ns, algorithm_type="dpmsolver++")
        noise = jax.random.normal(
            rng, (B, T, cfg.num_latents, cfg.latent_dim)
        )
        x = solver.sample(
            noise, steps=cfg.steps, order=cfg.order, method=cfg.method
        )
        if self.latent_std is not None:
            x = x * self.latent_std
        if self.latent_mean is not None:
            x = x + self.latent_mean
        return x

    # -- decoding -----------------------------------------------------------

    def decode_deltas(
        self, latent: jnp.ndarray, static_gs_padded: jnp.ndarray
    ) -> jnp.ndarray:
        """[B, T, N, C] latent -> [B, T, G, 14] per-Gaussian deltas."""
        B, T = latent.shape[:2]
        z = latent.reshape(B * T, latent.shape[2], latent.shape[3])
        return self.vae.apply(
            self.vae_params, z, static_gs_padded, T, method=MotionVAE.decode
        )

    # -- rendering ----------------------------------------------------------

    def render_4d(
        self,
        gs: GaussianSplat,
        deltas: jnp.ndarray,      # [T, G, 14]
        valid: Optional[jnp.ndarray] = None,
        num_views: int = 128,
        resolution: int = 512,
        pitch_deg: float = 20.0,
        radius: float = 2.0,
    ) -> np.ndarray:
        """Orbit sweep: frame t rendered from view (t * num_views / T + sweep)
        — mirrors utils/inference_utils.py:209-306 render_and_save_images.
        Returns [T, V, H, W, 3] uint8-range float frames.
        """
        T = deltas.shape[0]
        frames = []
        render = jax.jit(
            lambda d, cam_wv, cam_in: self.renderer.render(
                gs,
                orbit_camera(0, 0).replace(
                    world_view=cam_wv, intrinsics=cam_in,
                    height=resolution, width=resolution,
                ),
                delta=d, valid=valid,
            )["render"]
        )
        cams = [
            orbit_camera(360.0 * v / num_views, pitch_deg, radius=radius,
                         height=resolution, width=resolution)
            for v in range(num_views)
        ]
        for t in range(T):
            row = [
                np.asarray(render(deltas[t], cam.world_view, cam.intrinsics))
                for cam in cams
            ]
            frames.append(np.stack(row))
        return np.stack(frames)

    # -- end-to-end ---------------------------------------------------------

    def run(
        self,
        canonical_gs_activated: jnp.ndarray,  # [B, G, 14] padded
        gs_valid: jnp.ndarray,                # [B, G]
        cond_images: jnp.ndarray,             # [B, T, L, 1024]
        rng: jax.Array,
    ) -> Dict[str, Any]:
        anchors = self.prepare_static_conditioning(canonical_gs_activated, gs_valid)
        latent = self.sample_deformation_latent(
            cond_images, anchors, anchors[..., :3], rng
        )
        deltas = self.decode_deltas(latent, canonical_gs_activated)
        return {"latent": latent, "deltas": deltas, "anchors": anchors}
