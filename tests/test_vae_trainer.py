"""Two-phase VAE trainer tests on tiny synthetic scenes."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.models.motion_vae import MotionVAE
from gvfdiffusion_tpu.models.sparse_vae import GSConfig
from gvfdiffusion_tpu.models.static_vae import SparseTransformerVAE
from gvfdiffusion_tpu.render.renderer import RenderOptions
from gvfdiffusion_tpu.representations.camera import orbit_camera
from gvfdiffusion_tpu.sparse.tensor import from_lists
from gvfdiffusion_tpu.train.train_state import create_train_state, make_optimizer
from gvfdiffusion_tpu.train.vae_trainer import (
    make_joint_vae_step, make_static_vae_step, render_loss,
)

pytestmark = pytest.mark.slow

GS_CFG = GSConfig()
H = W = 32
B, V = 1, 2


def make_batch(rng):
    coords = np.array([[7, 7, 7], [8, 8, 8], [7, 8, 7], [8, 7, 8]])
    feats = np.asarray(
        jax.random.normal(rng, (4, 16))
    ).astype(np.float32)
    sv = from_lists([coords], [feats], resolution=16, capacity=8)
    cams = [orbit_camera(90.0 * v, 20.0, radius=1.2, height=H, width=W)
            for v in range(V)]
    extr = jnp.stack([c.world_view for c in cams])[None]
    intr = jnp.stack([c.intrinsics for c in cams])[None]
    images = jax.random.uniform(rng, (B, V, H, W, 3))
    return dict(feats=sv, images=images, extrinsics=extr, intrinsics=intr)


def make_static_vae():
    return SparseTransformerVAE(
        resolution=16, in_channels=16, model_channels=32,
        out_channels=GS_CFG.out_channels, latent_channels=4, num_blocks=1,
        window_size=4, num_heads=4,
    )


def test_render_loss_terms():
    a = jnp.zeros((1, H, W, 3))
    b = jnp.ones((1, H, W, 3)) * 0.5
    terms = render_loss(a, b, lambda_ssim=0.2)
    assert terms["render_rec"] == 0.5
    assert "ssim" in terms and terms["loss"] > terms["render_rec"]
    # identical -> zero
    t0 = render_loss(b, b, lambda_ssim=0.2)
    np.testing.assert_allclose(float(t0["render_rec"]), 0.0, atol=1e-7)


def test_static_phase_step_runs_and_improves():
    rng = jax.random.PRNGKey(0)
    batch = make_batch(rng)
    vae = make_static_vae()
    params = vae.init(rng, batch["feats"], rng)
    tx = make_optimizer(lr=1e-3, warmup_steps=0)
    state = create_train_state(params, tx)
    opts = RenderOptions(near=0.1, far=10.0, use_mip=True, kernel_size_2d=0.1,
                         backend="binned", max_per_tile=32)
    step = jax.jit(make_static_vae_step(
        lambda p, f, r, s: vae.apply(p, f, r, s), tx, GS_CFG, opts,
    ))
    losses = []
    for i in range(5):
        state, terms, rendered = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(terms["loss"]))
    assert np.isfinite(losses).all()
    assert rendered.shape == (B, V, H, W, 3)
    assert int(state.step) == 5
    assert losses[-1] < losses[0]  # overfits one tiny batch


def test_joint_phase_step_runs():
    rng = jax.random.PRNGKey(1)
    batch = make_batch(rng)
    T, N_pts = 2, 16
    batch.update(
        static_pc=jax.random.normal(rng, (B, N_pts, 3)) * 0.1,
        delta_pc=jax.random.normal(rng, (B, T, N_pts, 3)) * 0.02,
        frame_images=batch["images"],
        frame_extrinsics=batch["extrinsics"],
        frame_intrinsics=batch["intrinsics"],
        frame_idx=jnp.zeros((B, V), jnp.int32),
    )
    static_vae = make_static_vae()
    static_params = static_vae.init(rng, batch["feats"], rng)
    motion_vae = MotionVAE(
        depth=1, dim=48, queries_dim=48, output_dim=14, num_inputs=N_pts,
        num_latents=4, latent_dim=4, heads=4, knn_k=4,
    )
    from gvfdiffusion_tpu.models.sparse_vae import to_representation

    out, _, _ = static_vae.apply(static_params, batch["feats"], rng, False)
    gs, valid = to_representation(out, GS_CFG)
    st = gs.to_activated_tensor()
    motion_params = motion_vae.init(
        rng, st, valid, batch["static_pc"], batch["delta_pc"], rng
    )

    static_tx = make_optimizer(lr=1e-4, warmup_steps=0)
    motion_tx = make_optimizer(lr=1e-3, warmup_steps=0)
    s_state = create_train_state(static_params, static_tx)
    m_state = create_train_state(motion_params, motion_tx)

    opts = RenderOptions(near=0.1, far=10.0, use_mip=True, kernel_size_2d=0.1,
                         backend="binned", max_per_tile=32)
    step = jax.jit(make_joint_vae_step(
        lambda p, f, r, s: static_vae.apply(p, f, r, s),
        lambda p, *a: motion_vae.apply(p, *a),
        static_tx, motion_tx, GS_CFG, opts,
    ))
    s_state, m_state, terms = step(s_state, m_state, batch, jax.random.PRNGKey(2))
    for k in ("loss", "static_render", "frame_render", "interp", "kl_static",
              "kl_motion"):
        assert np.isfinite(float(terms[k])), k
    assert int(s_state.step) == 1 and int(m_state.step) == 1
    # both models received gradient updates
    assert float(terms["grad_norm_static"]) > 0
    assert float(terms["grad_norm_motion"]) > 0
