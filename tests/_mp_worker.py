"""Worker for the 2-process distributed DP test (test_multiprocess.py).

Run as: python _mp_worker.py <process_id> <num_processes> <port> <out.npz>

Each process owns ONE virtual CPU device; jax.distributed.initialize wires
the gloo coordination service so the two processes form one global mesh
(the DCN story of SURVEY §5.9 exercised for real — the TPU-native
replacement for the reference's `accelerate launch --num_processes N` DDP,
/root/reference/train_latent.py:42-48). The global batch is sharded over
the mesh "data" axis; XLA inserts the cross-process gradient all-reduce
inside the compiled train step.

Shared builders (`build_parts`, `global_batch`) are imported by the parent
test to compute the single-process baseline with identical seeds.
"""

from __future__ import annotations

import sys

import numpy as np

B, T, N, C, L, NS = 4, 2, 8, 4, 5, 4
STEPS = 2


def build_parts():
    import jax
    import jax.numpy as jnp

    from gvfdiffusion_tpu.diffusion.gaussian_diffusion import create_diffusion
    from gvfdiffusion_tpu.models.dit import DiT
    from gvfdiffusion_tpu.train.diffusion_trainer import make_train_step
    from gvfdiffusion_tpu.train.train_state import (
        create_train_state, make_optimizer,
    )

    model = DiT(
        resolution=N, in_channels=C, model_channels=24,
        static_cond_channels=14, image_cond_channels=9, out_channels=C,
        num_blocks=2, num_heads=4, pe_mode="ape", qk_rms_norm=True,
        no_temporal_attn=False,
    )
    batch = global_batch()
    params = model.init(
        jax.random.PRNGKey(7), batch["latent"][:1], jnp.zeros((1,)),
        batch["cond_images"][:1], batch["static_latent"][:1],
        batch["positions"][:1],
    )
    diffusion = create_diffusion(schedule="cosine", steps=20, mean_type="v")
    tx = make_optimizer(lr=1e-2, warmup_steps=0, grad_clip=1.0)
    state = create_train_state(params, tx)
    step_fn = make_train_step(model.apply, diffusion, tx)
    return state, step_fn


def global_batch():
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    return {
        "latent": jnp.asarray(rng.normal(size=(B, T, N, C)), jnp.float32),
        "cond_images": jnp.asarray(rng.normal(size=(B, T, L, 9)), jnp.float32),
        "static_latent": jnp.asarray(rng.normal(size=(B, NS, 14)), jnp.float32),
        "positions": jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32),
    }


def main():
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from gvfdiffusion_tpu.parallel.mesh import init_distributed

    n = init_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc,
        process_id=pid)
    assert n == nproc, f"process_count {n} != {nproc}"
    assert jax.device_count() == nproc and jax.local_device_count() == 1

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gvfdiffusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()  # global: one device per process
    data_sh = NamedSharding(mesh, P("data"))

    state, step_fn = build_parts()
    batch = global_batch()

    # each process contributes its LOCAL shard of the global batch
    def to_global(x):
        local = np.asarray(x).reshape(nproc, -1, *x.shape[1:])[pid]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))), local)

    gbatch = {k: to_global(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(3)

    step_j = jax.jit(step_fn, out_shardings=(None, NamedSharding(mesh, P())))
    for _ in range(STEPS):
        state, metrics = step_j(state, gbatch, rng)

    # params/metrics are fully replicated -> addressable on every process
    flat, _ = jax.tree_util.tree_flatten(state.params)
    np.savez(
        out_path,
        loss=np.asarray(jax.device_get(metrics["loss"])),
        grad_norm=np.asarray(jax.device_get(metrics["grad_norm"])),
        **{f"p{i}": np.asarray(jax.device_get(l)) for i, l in enumerate(flat)},
    )
    print(f"worker {pid}: done, loss={float(metrics['loss']):.6f}", flush=True)


if __name__ == "__main__":
    main()
