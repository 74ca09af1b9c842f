"""End-to-end toy video->4D flow through the public package API.

Miniature version of the inference_dpm_latent pipeline: DPM-Solver++ samples
a deformation latent with dual-scale CFG from a (randomly initialized) DiT,
the motion VAE decodes it into per-Gaussian per-frame deltas, the deltas
animate a canonical GaussianSplat, and the renderer produces frames. Then one
DP-sharded training step runs on the available devices. Prints shapes +
stats at every stage; writes frames as .npy + .png if matplotlib is present.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import jax

if os.environ.get("GVF_PLATFORM") == "cpu" or jax.default_backend() != "tpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.diffusion.dpm_solver import (
    DPMSolver, NoiseScheduleVP, model_wrapper,
)
from gvfdiffusion_tpu.diffusion.gaussian_diffusion import (
    create_diffusion, get_named_beta_schedule,
)
from gvfdiffusion_tpu.models.dit import DiT
from gvfdiffusion_tpu.models.motion_vae import MotionVAE, pad_static_gs
from gvfdiffusion_tpu.render import reference_renderer as rr
from gvfdiffusion_tpu.representations.camera import orbit_camera
from gvfdiffusion_tpu.representations.gaussians import from_activated

B, T, N_LAT, C_LAT = 1, 4, 16, 8     # frames, latent tokens, latent dim
N_GS = 64                             # canonical gaussians
L_IMG, C_IMG = 8, 32                  # DINOv2-ish tokens


def log(stage, **kw):
    print(f"[{stage}] " + " ".join(f"{k}={v}" for k, v in kw.items()))


def main():
    print(f"devices: {jax.devices()}")
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 10)

    # --- canonical static GS (toy: ring of gaussians) ---------------------
    theta = np.linspace(0, 2 * np.pi, N_GS, endpoint=False)
    xyz = np.stack([0.2 * np.cos(theta), 0.2 * np.sin(theta), np.zeros(N_GS)], -1)
    activated = np.concatenate(
        [
            xyz,                                  # world xyz
            np.full((N_GS, 3), 0.02),             # scales
            np.tile([1.0, 0, 0, 0], (N_GS, 1)),   # rotation
            np.random.default_rng(0).uniform(0.2, 0.8, (N_GS, 3)),  # dc color
            np.full((N_GS, 1), 0.9),              # opacity
        ],
        axis=-1,
    ).astype(np.float32)
    gs = from_activated(jnp.asarray(activated))
    static_gs_padded, gs_valid = pad_static_gs([activated], pad_to=N_GS)
    log("static_gs", n=N_GS, xyz_range=float(np.abs(xyz).max()))

    # --- DiT + DPM-Solver++ sampling of the deformation latent ------------
    dit = DiT(
        resolution=N_LAT, in_channels=C_LAT, model_channels=32,
        static_cond_channels=14, image_cond_channels=C_IMG, out_channels=C_LAT,
        num_blocks=2, num_heads=4, pe_mode="ape", qk_rms_norm=True,
    )
    cond = dict(
        cond_images=jax.random.normal(ks[0], (B, T, L_IMG, C_IMG)),
        static_latent=static_gs_padded[:, :N_LAT, :],
        positions=jax.random.uniform(ks[1], (B, N_LAT, 3)),
    )
    x_dummy = jnp.zeros((B, T, N_LAT, C_LAT))
    dit_params = dit.init(ks[2], x_dummy, jnp.zeros((B,)), **cond)
    n_params = sum(x.size for x in jax.tree.leaves(dit_params))
    log("dit", params=n_params)

    betas = get_named_beta_schedule("cosine", 1000)
    ns = NoiseScheduleVP.from_betas(betas)

    def raw_model(x, t, **kw):
        return dit.apply(dit_params, x, t, kw["cond_images"],
                         kw["static_latent"], kw["positions"])

    model_fn = model_wrapper(
        raw_model, ns, model_type="v", guidance_type="classifier-free",
        condition=cond, unconditional_condition=cond,
        guidance_scale=2.0, guidance_scale2=5.0,
    )
    solver = DPMSolver(model_fn, ns)
    t0 = time.time()
    sample_jit = jax.jit(
        lambda noise: solver.sample(noise, steps=8, order=2, method="multistep")
    )
    latent = sample_jit(jax.random.normal(ks[3], (B, T, N_LAT, C_LAT)))
    latent.block_until_ready()
    log("dpm_sample", steps=8, order=2, cfg="3-way dual-scale",
        secs=round(time.time() - t0, 2),
        latent_std=round(float(latent.std()), 4),
        finite=bool(np.isfinite(np.asarray(latent)).all()))

    # --- motion VAE decode: latent -> per-frame 14-dim deltas -------------
    vae = MotionVAE(
        depth=2, dim=48, queries_dim=48, output_dim=14, num_inputs=N_GS,
        num_latents=N_LAT, latent_dim=C_LAT, heads=4, knn_k=4,
    )
    vae_inputs = dict(
        static_gs=static_gs_padded, gs_valid=gs_valid,
        static_pc=jnp.asarray(xyz, jnp.float32)[None],
        delta_pc=jax.random.normal(ks[4], (B, T, N_GS, 3)) * 0.05,
        rng=ks[5],
    )
    vae_params = vae.init(ks[6], **vae_inputs)
    z = latent.reshape(B * T, N_LAT, C_LAT)
    deltas = vae.apply(vae_params, z, static_gs_padded, T, method=MotionVAE.decode)
    log("vae_decode", deltas=str(deltas.shape),
        delta_absmax=round(float(jnp.abs(deltas).max()), 4))

    # make motion visible for the render check (decoder is zero-init)
    wiggle = jnp.sin(jnp.linspace(0, 2 * np.pi, T))[:, None, None]
    deltas = deltas.at[..., 0:1].add(0.15 * wiggle)

    # --- render animated frames (tile-binned differentiable backend) ------
    from gvfdiffusion_tpu.render.renderer import GaussianRenderer, RenderOptions

    cam = orbit_camera(0.0, 20.0, radius=1.5, height=48, width=48)
    renderer = GaussianRenderer(RenderOptions(
        near=0.1, far=10.0, bg_color=(1.0, 1.0, 1.0), use_mip=False,
        backend="binned", max_per_tile=64,
    ))
    frames = []
    render_jit = jax.jit(lambda d: renderer.render(gs, cam, delta=d)["render"])
    for f in range(T):
        frames.append(np.asarray(render_jit(deltas[0, f])))
    frames = np.stack(frames)
    motion = float(np.abs(np.diff(frames, axis=0)).max())
    log("render", frames=str(frames.shape),
        finite=bool(np.isfinite(frames).all()),
        interframe_motion=round(motion, 4))
    assert motion > 0.01, "animated deltas must change rendered pixels"

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "toy_frames.npy"), frames)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, T, figsize=(3 * T, 3))
        for f, ax in enumerate(axes):
            ax.imshow(np.clip(frames[f], 0, 1))
            ax.set_title(f"t={f}")
            ax.axis("off")
        fig.savefig(os.path.join(out_dir, "toy_frames.png"), dpi=80)
        log("saved", png=os.path.join(out_dir, "toy_frames.png"))
    except ImportError:
        log("saved", npy=os.path.join(out_dir, "toy_frames.npy"))

    # --- one DP training step over all devices ----------------------------
    from gvfdiffusion_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from gvfdiffusion_tpu.train.diffusion_trainer import make_train_step
    from gvfdiffusion_tpu.train.train_state import create_train_state, make_optimizer

    n_dev = jax.device_count()
    mesh = make_mesh(n_dev, axes=("data",))
    batch = dict(
        latent=jax.random.normal(ks[7], (n_dev, T, N_LAT, C_LAT)),
        cond_images=jax.random.normal(ks[8], (n_dev, T, L_IMG, C_IMG)),
        static_latent=jnp.tile(static_gs_padded[:, :N_LAT, :], (n_dev, 1, 1)),
        positions=jax.random.uniform(ks[9], (n_dev, N_LAT, 3)),
    )
    diffusion = create_diffusion(schedule="cosine", steps=100, mean_type="v")
    tx = make_optimizer(lr=1e-4, warmup_steps=10)
    state = create_train_state(dit_params, tx)
    step_fn = jax.jit(make_train_step(dit.apply, diffusion, tx))
    with mesh:
        state = replicate(state, mesh)
        sbatch = shard_batch(batch, mesh)
        for i in range(3):
            state, metrics = step_fn(state, sbatch, jax.random.PRNGKey(i))
            log("train_step", i=i, loss=round(float(metrics["loss"]), 4),
                grad_norm=round(float(metrics["grad_norm"]), 4),
                devices=n_dev)

    print("E2E OK")


if __name__ == "__main__":
    sys.exit(main())
