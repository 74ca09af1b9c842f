"""Diffusion (DiT) training CLI.

Re-design of reference main_latent.py:15-130 + TrainLoop train_latent.py:19-272:
builds DiT + (respaced) diffusion + uniform schedule sampler + latent dataset,
runs the jitted DP train step with warmup/EMA/clip, KV logging, periodic orbax
checkpoints, auto-resume.

Usage:
  python -m gvfdiffusion_tpu.cli.main_latent --config configs/diffusion.yml \
      --data_dir=/data/latents --train.total_steps=500000
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.gaussian_diffusion import create_diffusion
from ..models.dit import DiT
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..train.diffusion_trainer import make_train_step
from ..train.train_state import create_train_state, make_optimizer
from ..utils import logger
from ..utils.checkpoint import CheckpointManager, auto_resume
from ..utils.config import Config, load_config


def build_model(cfg: Config) -> DiT:
    m = cfg.model
    return DiT(
        resolution=m.resolution, in_channels=m.in_channels,
        model_channels=m.model_channels,
        static_cond_channels=m.static_cond_channels,
        image_cond_channels=m.image_cond_channels,
        out_channels=m.out_channels, num_blocks=m.num_blocks,
        num_heads=m.num_heads, mlp_ratio=m.mlp_ratio, pe_mode=m.pe_mode,
        qk_rms_norm=m.qk_rms_norm, no_temporal_attn=m.no_temporal_attn,
        share_mod=m.share_mod, remat_blocks=m.remat_blocks,
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    args, overrides = p.parse_known_args(argv)
    cfg = load_config(args.config, overrides)

    logger.configure(cfg.exp_dir)
    logger.log(f"devices: {jax.devices()}")

    model = build_model(cfg)
    diffusion = create_diffusion(
        schedule=cfg.diffusion.noise_schedule, steps=cfg.diffusion.steps,
        mean_type=cfg.diffusion.predict_type, var_type=cfg.diffusion.var_type,
        min_snr=cfg.diffusion.min_snr,
        rescale_timesteps=cfg.diffusion.rescale_timesteps,
    )

    from ..data.dataset_latent import LatentDataset, load_data

    dataset = LatentDataset(
        cfg.data_dir, num_frames=cfg.train.sample_timesteps,
        num_latents=cfg.model.resolution, latent_dim=cfg.model.in_channels,
        uncond_p=cfg.train.uncond_p, seed=cfg.train.seed,
    )
    if len(dataset) == 0:
        logger.log(f"no data found under {cfg.data_dir!r}; aborting")
        return 1
    n_dev = jax.device_count()
    global_batch = cfg.train.batch_size * n_dev
    data = load_data(dataset, global_batch)

    # init from one batch
    batch0 = next(data)
    rng = jax.random.PRNGKey(cfg.train.seed)
    params = model.init(
        rng, jnp.asarray(batch0["latent"]), jnp.zeros((global_batch,)),
        jnp.asarray(batch0["cond_images"]), jnp.asarray(batch0["static_latent"]),
        jnp.asarray(batch0["positions"]),
    )
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.log(f"DiT parameters: {n_params/1e6:.1f}M")

    tx = make_optimizer(
        lr=cfg.train.lr, warmup_steps=cfg.train.warmup_steps,
        weight_decay=cfg.train.weight_decay, grad_clip=cfg.train.grad_clip,
        grad_accum=cfg.train.grad_accum,
    )
    # EMA fires every micro-step; r^(1/accum) keeps the same horizon as the
    # reference's once-per-optimizer-step EMA (train_latent.py:223)
    ema_rate = cfg.train.ema_rate ** (1.0 / max(cfg.train.grad_accum, 1))
    state = create_train_state(params, tx)
    ckpt = CheckpointManager(f"{cfg.exp_dir}/checkpoints")
    state, start_step = auto_resume(f"{cfg.exp_dir}/checkpoints", state)
    if start_step:
        logger.log(f"auto-resumed from step {start_step}")

    mesh = make_mesh(n_dev, axes=("data",))
    step_fn = jax.jit(make_train_step(model.apply, diffusion, tx,
                                      ema_rate=ema_rate))

    from ..data.prefetch import Prefetcher

    with mesh:
        state = replicate(state, mesh)
        # host IO + H2D run one batch ahead of the device (data/prefetch.py)
        prefetch = Prefetcher(data, place_fn=lambda b: shard_batch(b, mesh))
        t_last = time.time()
        for step in range(int(state.step), cfg.train.total_steps):
            batch = next(prefetch)
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
            if step % cfg.train.log_interval == 0:
                jax.block_until_ready(metrics["loss"])
                now = time.time()
                logger.logkv("step", step)
                logger.logkv("loss", float(metrics["loss"]))
                logger.logkv("mse", float(metrics["mse"]))
                logger.logkv("grad_norm", float(metrics["grad_norm"]))
                logger.logkv_mean("step_time", (now - t_last) / max(cfg.train.log_interval, 1))
                t_last = now
                logger.dumpkvs()
            if step > 0 and step % cfg.train.save_interval == 0:
                ckpt.save(jax.device_get(state), step)
        prefetch.close()
        ckpt.save(jax.device_get(state), cfg.train.total_steps, force=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
