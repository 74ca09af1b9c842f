"""Video -> 4D inference CLI.

Re-design of reference inference_dpm_latent.py:41-321 for offline
environments: consumes precomputed conditioning (DINOv2 feature npz + a
canonical GS, e.g. from the TRELLIS stage or `encode_latent`) and produces
deformation latents, per-frame deltas, orbit-sweep renders, and an mp4/npz.

Checkpoints load from orbax directories (utils/checkpoint.py) or from
converted torch weights (utils/weight_convert.py).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dit import DiT
from ..models.motion_vae import MotionVAE
from ..pipelines.video_to_4d import VideoTo4DConfig, VideoTo4DPipeline
from ..render.renderer import RenderOptions
from ..representations.gaussians import from_activated
from ..utils import logger
from ..utils.config import load_config


def build_parser() -> argparse.ArgumentParser:
    """Flag surface pinned to the reference launch (reference
    inference_dpm_latent.py:276-316 defaults; scripts/run_in_the_wild.sh:39
    passes --adaptive --use_fp16 --num_timesteps 32 and NO guidance flags,
    so guidance defaults MUST be 1.0/1.0 — the single-conditional-pass CFG
    branch, reference model/dpmsolver.py:329-330)."""
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--input", required=True,
                   help="npz with canonical_gs [G,14], cond_images [T,L,1024]")
    p.add_argument("--output_dir", default="out_4d")
    p.add_argument("--dit_ckpt", default=None)
    p.add_argument("--vae_ckpt", default=None)
    # reference name for the respaced solver step count (its default 100);
    # --steps is kept as an alias and must agree if both are given
    p.add_argument("--rescale_timesteps", type=int, default=100)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--order", type=int, default=2)
    p.add_argument("--adaptive", action="store_true")
    p.add_argument("--guidance_scale", type=float, default=1.0)
    p.add_argument("--guidance_scale2", type=float, default=1.0)
    # accepted for launch-script compatibility: frame count actually comes
    # from the input npz (validated against this when given)
    p.add_argument("--num_timesteps", type=int, default=None)
    # bf16 is the TPU equivalent of the reference's fp16 autocast and is
    # already the kernels' compute dtype; accepted so the shipped launch
    # line parses unchanged
    p.add_argument("--use_fp16", action="store_true")
    p.add_argument("--num_views", type=int, default=128)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    return p


def pipeline_config_from_args(args, num_frames: int, num_latents: int,
                              latent_dim: int) -> VideoTo4DConfig:
    """args -> VideoTo4DConfig, the mapping the CLI test pins."""
    steps = args.steps if args.steps is not None else args.rescale_timesteps
    return VideoTo4DConfig(
        steps=steps, order=args.order,
        method="adaptive" if args.adaptive else "multistep",
        guidance_scale=args.guidance_scale,
        guidance_scale2=args.guidance_scale2,
        num_frames=num_frames, num_latents=num_latents,
        latent_dim=latent_dim,
    )


def main(argv=None):
    p = build_parser()
    args, overrides = p.parse_known_args(argv)
    cfg = load_config(args.config, overrides)
    logger.configure(args.output_dir)

    data = np.load(args.input)
    canonical_gs = jnp.asarray(data["canonical_gs"], jnp.float32)[None]
    cond_images = jnp.asarray(data["cond_images"], jnp.float32)[None]
    gs_valid = jnp.ones(canonical_gs.shape[:2], bool)
    if args.num_timesteps is not None and args.num_timesteps != cond_images.shape[1]:
        p.error(f"--num_timesteps {args.num_timesteps} != input frame count "
                f"{cond_images.shape[1]}")

    m = cfg.model
    dit = DiT(
        resolution=m.resolution, in_channels=m.in_channels,
        model_channels=m.model_channels,
        static_cond_channels=m.static_cond_channels,
        image_cond_channels=m.image_cond_channels,
        out_channels=m.out_channels, num_blocks=m.num_blocks,
        num_heads=m.num_heads, pe_mode=m.pe_mode, qk_rms_norm=m.qk_rms_norm,
        no_temporal_attn=m.no_temporal_attn,
    )
    mv = cfg.motion_vae
    vae = MotionVAE(
        depth=mv.depth, dim=mv.dim, queries_dim=mv.queries_dim,
        output_dim=mv.output_dim, num_inputs=mv.num_inputs,
        num_latents=mv.num_latents, latent_dim=mv.latent_dim, heads=mv.heads,
        knn_k=mv.knn_k, beta=mv.beta,
    )

    rng = jax.random.PRNGKey(args.seed)
    T = cond_images.shape[1]

    def init_params():
        k1, k2 = jax.random.split(rng)
        x = jnp.zeros((1, T, m.resolution, m.in_channels))
        dit_params = dit.init(
            k1, x, jnp.zeros((1,)), cond_images,
            canonical_gs[:, : m.resolution], canonical_gs[:, : m.resolution, :3],
        )
        vae_inputs = dict(
            static_gs=canonical_gs, gs_valid=gs_valid,
            static_pc=canonical_gs[..., :3],
            delta_pc=jnp.zeros((1, T, canonical_gs.shape[1], 3)),
            rng=k2,
        )
        vae_params = vae.init(k2, **vae_inputs)
        return dit_params, vae_params

    if args.dit_ckpt and os.path.exists(args.dit_ckpt):
        from ..utils.checkpoint import CheckpointManager

        tmpl_dit, tmpl_vae = init_params()
        dit_params = CheckpointManager(args.dit_ckpt).restore(tmpl_dit)
        vae_params = (
            CheckpointManager(args.vae_ckpt).restore(tmpl_vae)
            if args.vae_ckpt else tmpl_vae
        )
    else:
        logger.log("no checkpoints given — using random init (smoke mode)")
        dit_params, vae_params = init_params()

    pipe_cfg = pipeline_config_from_args(
        args, num_frames=T, num_latents=m.resolution,
        latent_dim=m.in_channels,
    )
    pipeline = VideoTo4DPipeline(
        dit, dit_params, vae, vae_params, pipe_cfg,
        render_options=RenderOptions(
            near=cfg.render.near, far=cfg.render.far,
            bg_color=cfg.render.bg_color, use_mip=cfg.render.use_mip,
            kernel_size_2d=cfg.render.kernel_size_2d, backend=cfg.render.backend,
            max_per_tile=cfg.render.max_per_tile,
        ),
    )

    out = pipeline.run(canonical_gs, gs_valid, cond_images, rng)
    os.makedirs(args.output_dir, exist_ok=True)
    np.savez(
        os.path.join(args.output_dir, "deformation.npz"),
        latent=np.asarray(out["latent"]),
        deltas=np.asarray(out["deltas"]),
    )
    logger.log(f"latent {out['latent'].shape}, deltas {out['deltas'].shape}")

    gs = from_activated(canonical_gs[0])
    frames = pipeline.render_4d(
        gs, out["deltas"][0], valid=gs_valid[0],
        num_views=min(args.num_views, 8), resolution=args.resolution,
    )
    np.save(os.path.join(args.output_dir, "frames.npy"), frames)
    try:
        import imageio

        sweep = frames[:, 0]  # first view per frame
        imageio.mimsave(
            os.path.join(args.output_dir, "video.mp4"),
            (np.clip(sweep, 0, 1) * 255).astype(np.uint8), fps=8,
        )
    except Exception as e:  # imageio/codec may be absent offline
        logger.log(f"mp4 export skipped: {e}")
    logger.log(f"wrote {args.output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
