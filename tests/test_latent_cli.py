"""DiT-train CLI smoke: the full main_latent loop (reference main_latent.py:15-130
+ TrainLoop train_latent.py:19-272) at tiny shapes — synthetic on-disk dataset
in the reference layout, prefetched sharded batches, periodic + final orbax
checkpoints, auto-resume."""

import os

import numpy as np
import pytest
import torch

from gvfdiffusion_tpu.cli.main_latent import main


def _write_dataset(root, n_objects=2, t_total=6, n_latents=8, c=4, l_tok=5,
                   cond_dim=16):
    rng = np.random.default_rng(0)
    for i in range(n_objects):
        d = os.path.join(root, f"obj{i:03d}")
        os.makedirs(d, exist_ok=True)
        torch.save(
            {
                "latent_mean": torch.from_numpy(
                    rng.standard_normal((t_total, n_latents, c)).astype(np.float32)),
                "latent_std": torch.from_numpy(
                    (rng.random((t_total, n_latents, c)) * 0.1).astype(np.float32)),
                "fps_sampled_gs_1024": torch.from_numpy(
                    rng.standard_normal((1024, 14)).astype(np.float32)),
            },
            os.path.join(d, "deformation_latent.pt"),
        )
        np.savez(
            os.path.join(d, "dinov2_features.npz"),
            features=rng.standard_normal(
                (t_total, l_tok, cond_dim)).astype(np.float32),
        )


@pytest.mark.slow
def test_main_latent_smoke_and_resume(tmp_path):
    data = str(tmp_path / "data")
    exp = str(tmp_path / "exp")
    _write_dataset(data)

    args = [
        f"--data_dir={data}", f"--exp_dir={exp}",
        "--model.resolution=8", "--model.in_channels=4",
        "--model.out_channels=4", "--model.model_channels=16",
        "--model.num_blocks=1", "--model.num_heads=2",
        "--model.image_cond_channels=16",
        "--diffusion.steps=8",
        "--train.batch_size=1", "--train.grad_accum=1",
        "--train.warmup_steps=1", "--train.sample_timesteps=4",
        "--train.log_interval=2", "--train.save_interval=2",
        "--train.total_steps=3",
    ]
    assert main(args) == 0
    ckpts = os.listdir(os.path.join(exp, "checkpoints"))
    assert ckpts, "no checkpoint written"

    # auto-resume: starts at the saved final step, loop body is a no-op,
    # re-saves the final checkpoint
    assert main(args) == 0


def test_main_latent_empty_dataset(tmp_path):
    empty = str(tmp_path / "nothing")
    os.makedirs(empty)
    rc = main([f"--data_dir={empty}", f"--exp_dir={tmp_path / 'exp'}"])
    assert rc == 1
