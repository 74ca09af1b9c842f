"""Sustained train-loop throughput with the REAL data pipeline (VERDICT r3
item 9): synthetic objects on disk in the reference layout
(deformation_latent.pt + dinov2_features.npz, reference
dataset/dataset_latent.py:16-212), loaded by data/dataset_latent.py, fed
through data/prefetch.Prefetcher into the compiled full-size DiT train step
— measures steps/sec over a sustained run, vs the step-in-isolation number
(1347 ms, docs/BENCH_NOTES.md) and vs a synchronous (no-prefetch) loop.

Run: python benchmarks/train_throughput_bench.py [--steps 30] [--objects 4]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax as _jax

os.makedirs(os.path.join(_ROOT, ".jax_cache"), exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax
import jax.numpy as jnp
import numpy as np


def make_synthetic_dataset(root: str, n_objects: int, t_total: int = 32,
                           n_latents: int = 512, c: int = 16,
                           l_tokens: int = 1370):
    """Reference on-disk layout at full shapes (~175 MB dinov2 file/object)."""
    import torch

    rng = np.random.default_rng(0)
    for i in range(n_objects):
        d = os.path.join(root, f"obj{i:03d}")
        os.makedirs(d, exist_ok=True)
        torch.save(
            {
                "latent_mean": torch.from_numpy(
                    rng.standard_normal((t_total, n_latents, c), np.float32)),
                "latent_std": torch.from_numpy(
                    (rng.random((t_total, n_latents, c), np.float32) * 0.1)),
                "fps_sampled_gs_1024": torch.from_numpy(
                    rng.standard_normal((1024, 14), np.float32)),
                "fps_sampled_gs_4096": torch.from_numpy(
                    rng.standard_normal((4096, 14), np.float32)),
            },
            os.path.join(d, "deformation_latent.pt"),
        )
        np.savez(
            os.path.join(d, "dinov2_features.npz"),
            features=rng.standard_normal(
                (t_total, l_tokens, 1024)).astype(np.float32),
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--objects", type=int, default=4)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--frames", type=int, default=24)
    args = p.parse_args()

    from gvfdiffusion_tpu.data.dataset_latent import LatentDataset, load_data
    from gvfdiffusion_tpu.data.prefetch import Prefetcher
    from gvfdiffusion_tpu.diffusion.gaussian_diffusion import create_diffusion
    from gvfdiffusion_tpu.models.dit import DiT
    from gvfdiffusion_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from gvfdiffusion_tpu.train.diffusion_trainer import make_train_step
    from gvfdiffusion_tpu.train.train_state import (
        create_train_state, make_optimizer,
    )

    print(f"devices: {jax.devices()}")
    root = tempfile.mkdtemp(prefix="gvf_tt_")
    try:
        t0 = time.time()
        make_synthetic_dataset(root, args.objects)
        print(f"synthetic dataset: {args.objects} objects "
              f"({time.time()-t0:.1f} s to write)")

        ds = LatentDataset(root, num_frames=args.frames, num_latents=512,
                           latent_dim=16, uncond_p=0.1)
        data = load_data(ds, args.batch)

        # host-side loader cost alone
        t0 = time.time()
        n_probe = 5
        for _ in range(n_probe):
            next(data)
        t_load = (time.time() - t0) / n_probe
        print(f"host loader: {t_load*1e3:.0f} ms/batch (batch {args.batch})")

        model = DiT(remat_blocks=12)
        batch0 = next(data)
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch0["latent"]),
            jnp.zeros((args.batch,)), jnp.asarray(batch0["cond_images"]),
            jnp.asarray(batch0["static_latent"]),
            jnp.asarray(batch0["positions"]),
        )
        diffusion = create_diffusion()
        tx = make_optimizer()
        state = create_train_state(params, tx)
        step_fn = jax.jit(make_train_step(model.apply, diffusion, tx))

        mesh = make_mesh(jax.device_count(), axes=("data",))
        with mesh:
            state = replicate(state, mesh)
            # warm the compile + device
            b = shard_batch(batch0, mesh)
            state, m = step_fn(state, b, jax.random.PRNGKey(0))
            jax.device_get(m["loss"])

            def run(loop_name, batches):
                nonlocal state
                t0 = time.time()
                m = None
                for i, b in zip(range(args.steps), batches):
                    b = shard_batch(b, mesh) if loop_name == "sync" else b
                    state, m = step_fn(state, b, jax.random.PRNGKey(i + 1))
                jax.device_get(m["loss"])  # real barrier (axon: scalar fetch)
                dt = (time.time() - t0) / args.steps
                print(f"{loop_name:>8}: {dt*1e3:.0f} ms/step "
                      f"({1.0/dt:.3f} steps/s) over {args.steps} steps")
                return dt

            t_sync = run("sync", data)
            pf = Prefetcher(data, place_fn=lambda x: shard_batch(x, mesh))
            t_pf = run("prefetch", pf)
            pf.close()

        print(f"JSON: {{\"metric\": \"train_steps_per_sec\", "
              f"\"value\": {1.0/t_pf:.4f}, \"unit\": \"steps/s\", "
              f"\"sync\": {1.0/t_sync:.4f}, "
              f"\"host_load_ms\": {t_load*1e3:.0f}}}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
