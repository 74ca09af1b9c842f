"""Two-phase VAE training CLI.

Re-design of reference main_vae.py:14-173 + TrainLoop train_vae.py:23-586:
phase A trains the static sparse-transformer VAE alone; after
`train.static_vae_steps` phase B jointly trains static + motion VAEs with
render losses, with the static optimizer at lr x static_lr_scale (reference
train_vae.py:105). Dual EMA + orbax checkpoints for both states.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.motion_vae import MotionVAE
from ..models.sparse_vae import GSConfig
from ..models.static_vae import SparseTransformerVAE
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..render.renderer import RenderOptions
from ..train.train_state import create_train_state, freeze_subtrees, make_optimizer
from ..train.vae_trainer import make_joint_vae_step, make_static_vae_step
from ..utils import logger
from ..utils.checkpoint import CheckpointManager, auto_resume
from ..utils.config import load_config


def init_static_from_torch(fresh_params, ckpt_path: str, num_blocks: int,
                           num_heads: int):
    """TRELLIS/GVF torch checkpoint -> init params, with out-layer surgery.

    Mirrors reference main_vae.py:31-45: when the checkpoint's out_layer
    shape disagrees with the model (TRELLIS ships a latent head, GVF training
    wants the gaussian head), drop out_layer and keep the fresh zero-init;
    everything else loads strictly. (The torch MipGS_perturbation buffer has
    no flax counterpart — perturbation is computed, not stored.)
    """
    from ..utils.weight_convert import convert_static_vae, load_torch_checkpoint

    sd = load_torch_checkpoint(ckpt_path)
    converted = convert_static_vae(sd, num_blocks=num_blocks,
                                   num_heads=num_heads)["params"]
    mismatch = False
    if "out_layer" in converted:
        fresh_k = fresh_params["params"]["out_layer"]["Dense_0"]["kernel"]
        conv_k = converted["out_layer"]["Dense_0"]["kernel"]
        mismatch = tuple(conv_k.shape) != tuple(fresh_k.shape)
        if mismatch:
            converted = {k: v for k, v in converted.items() if k != "out_layer"}
    merged = dict(fresh_params["params"])
    merged.update(converted)
    logger.log(
        f"initialized static VAE from {ckpt_path} "
        f"({len(converted)} top-level modules"
        f"{', out_layer kept fresh (shape surgery)' if mismatch else ''})"
    )
    return {"params": merged}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    args, overrides = p.parse_known_args(argv)
    cfg = load_config(args.config, overrides)
    logger.configure(cfg.exp_dir)

    from ..data.dataset_vae import VAEDataset, load_data

    sv = cfg.static_vae
    dataset = VAEDataset(
        cfg.data_dir, resolution=sv.resolution,
        num_points=cfg.motion_vae.num_inputs,
        num_timesteps=cfg.train.sample_timesteps,
        image_size=cfg.render.resolution,
        voxel_capacity=sv.voxel_capacity,
    )
    if len(dataset) == 0:
        logger.log(f"no data found under {cfg.data_dir!r}; aborting")
        return 1
    # 8-way DP like the reference's accelerate launch (README.md:77):
    # per-device batch_size scales to a global batch over the data mesh axis
    n_dev = jax.device_count()
    data = load_data(dataset, cfg.train.batch_size * n_dev)
    static_vae = SparseTransformerVAE(
        resolution=sv.resolution, in_channels=sv.in_channels,
        model_channels=sv.model_channels, out_channels=sv.out_channels,
        latent_channels=sv.latent_channels, num_blocks=sv.num_blocks,
        num_heads=sv.num_heads, window_size=sv.window_size,
        attn_mode=sv.attn_mode, norm_output=sv.norm_output,
        remat_blocks=sv.remat_blocks,
    )
    mv = cfg.motion_vae
    motion_vae = MotionVAE(
        depth=mv.depth, dim=mv.dim, queries_dim=mv.queries_dim,
        output_dim=mv.output_dim, num_inputs=mv.num_inputs,
        num_latents=mv.num_latents, latent_dim=mv.latent_dim, heads=mv.heads,
        knn_k=mv.knn_k, beta=mv.beta,
    )

    rng = jax.random.PRNGKey(cfg.train.seed)
    batch0 = next(data)
    feats0 = batch0["feats"]
    static_params = static_vae.init(rng, feats0, rng)
    if cfg.train.static_vae_init:
        static_params = init_static_from_torch(
            static_params, cfg.train.static_vae_init,
            num_blocks=sv.num_blocks, num_heads=sv.num_heads,
        )

    static_tx = make_optimizer(lr=cfg.train.lr * cfg.train.static_lr_scale,
                               warmup_steps=cfg.train.warmup_steps,
                               grad_clip=cfg.train.grad_clip)
    static_tx_solo = make_optimizer(lr=cfg.train.lr,
                                    warmup_steps=cfg.train.warmup_steps,
                                    grad_clip=cfg.train.grad_clip)
    if cfg.train.static_vae_init and not cfg.train.finetune_encoder:
        # reference main_vae.py:46-47: pretrained encoder stays frozen
        static_tx = freeze_subtrees(static_tx, static_params, ("enc_",))
        static_tx_solo = freeze_subtrees(static_tx_solo, static_params, ("enc_",))
        logger.log("encoder frozen (set train.finetune_encoder=true to train it)")
    motion_tx = make_optimizer(lr=cfg.train.lr,
                               warmup_steps=cfg.train.warmup_steps,
                               grad_clip=cfg.train.grad_clip)

    static_state = create_train_state(static_params, static_tx_solo)
    static_ckpt = CheckpointManager(f"{cfg.exp_dir}/static_vae")
    static_state, start = auto_resume(f"{cfg.exp_dir}/static_vae", static_state)

    render_opts = RenderOptions(
        near=cfg.render.near, far=cfg.render.far, bg_color=cfg.render.bg_color,
        use_mip=cfg.render.use_mip, kernel_size_2d=cfg.render.kernel_size_2d,
        backend=cfg.render.backend, max_per_tile=cfg.render.max_per_tile,
    )
    gs_cfg = GSConfig()

    # LPIPS must never silently vanish: the reference trains with a 0.2 LPIPS
    # term (train_vae.py:328-334) — requesting it without weights is an error
    lpips_fn = None
    if cfg.loss.lambda_lpips > 0:
        from ..ops.lpips import load_lpips

        lpips_fn = load_lpips(cfg.loss.lpips_weights)
        if lpips_fn is None:
            raise SystemExit(
                f"loss.lambda_lpips={cfg.loss.lambda_lpips} but no LPIPS "
                f"weights at loss.lpips_weights={cfg.loss.lpips_weights!r}. "
                "Convert the torch vgg16+lin checkpoint with "
                "gvfdiffusion_tpu.ops.lpips.convert_torch_lpips and point "
                "loss.lpips_weights at the .npz, or set loss.lambda_lpips=0 "
                "to train without the perceptual term."
            )
    loss_kw = dict(
        lambda_ssim=cfg.loss.lambda_ssim, lambda_lpips=cfg.loss.lambda_lpips,
        lpips_fn=lpips_fn,
    )

    static_step = jax.jit(make_static_vae_step(
        lambda p, f, r, s: static_vae.apply(p, f, r, s),
        static_tx_solo, gs_cfg, render_opts,
        lambda_kl=cfg.loss.lambda_kl, **loss_kw,
    ))

    motion_state = None
    joint_step = None
    motion_ckpt = CheckpointManager(f"{cfg.exp_dir}/motion_vae")

    mesh = make_mesh(n_dev, axes=("data",))
    t_last = time.time()
    with mesh:
        static_state = replicate(static_state, mesh)
        for step in range(start, cfg.train.total_steps):
            batch = next(data)
            batch = {k: (v if k == "feats" else jnp.asarray(v))
                     for k, v in batch.items()}
            if step < cfg.train.static_vae_steps:
                batch = shard_batch(batch, mesh)
                static_state, terms, rendered = static_step(
                    static_state, batch, jax.random.PRNGKey(step)
                )
            else:
                if motion_state is None:
                    from ..models.sparse_vae import to_representation

                    out, _, _ = static_vae.apply(
                        static_state.params, batch["feats"], rng, False
                    )
                    gs, valid = to_representation(out, gs_cfg)
                    st = gs.to_activated_tensor()
                    motion_params = motion_vae.init(
                        rng, st, valid, batch["static_pc"], batch["delta_pc"], rng
                    )
                    motion_state = create_train_state(motion_params, motion_tx)
                    motion_state, _ = auto_resume(
                        f"{cfg.exp_dir}/motion_vae", motion_state)
                    motion_state = replicate(motion_state, mesh)
                    joint_step = jax.jit(make_joint_vae_step(
                        lambda p, f, r, s: static_vae.apply(p, f, r, s),
                        lambda p, *a: motion_vae.apply(p, *a),
                        static_tx, motion_tx, gs_cfg, render_opts,
                        lambda_kl=cfg.loss.lambda_kl,
                        lambda_xyz=cfg.loss.lambda_xyz, **loss_kw,
                    ))
                # phase-B batches render a subset of frames
                T = batch["delta_pc"].shape[1]
                batch.setdefault("frame_images", batch["images"])
                batch.setdefault("frame_extrinsics", batch["extrinsics"])
                batch.setdefault("frame_intrinsics", batch["intrinsics"])
                batch.setdefault("frame_idx", jnp.clip(batch["frame_idx"], 0, T - 1))
                batch = shard_batch(batch, mesh)
                static_state, motion_state, terms = joint_step(
                    static_state, motion_state, batch, jax.random.PRNGKey(step)
                )

            if step % cfg.train.log_interval == 0:
                logger.logkv("step", step)
                for k, v in terms.items():
                    logger.logkv(k, float(v))
                now = time.time()
                logger.logkv_mean(
                    "step_time", (now - t_last) / max(cfg.train.log_interval, 1))
                t_last = now
                logger.dumpkvs()
            if step > 0 and step % cfg.train.save_interval == 0:
                static_ckpt.save(jax.device_get(static_state), step)
                if motion_state is not None:
                    motion_ckpt.save(jax.device_get(motion_state), step)
    return 0


if __name__ == "__main__":
    sys.exit(main())
