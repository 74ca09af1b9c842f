"""Registry from_pretrained roundtrip, script_util, profiling smoke."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.models import registry


def test_create_model_known_names():
    m = registry.create_model("DiT", num_blocks=1, model_channels=32,
                              num_heads=4, resolution=8, in_channels=4,
                              out_channels=4)
    assert m.num_blocks == 1
    m2 = registry.create_model("SparseStructureFlowModel", resolution=8,
                               in_channels=4, model_channels=32,
                               cond_channels=16, out_channels=4, num_blocks=1,
                               num_heads=4)
    assert m2.patch_size == 2


def test_from_pretrained_npz_roundtrip(tmp_path):
    from gvfdiffusion_tpu.models.dit import DiT

    model = DiT(resolution=8, in_channels=4, model_channels=32,
                static_cond_channels=14, image_cond_channels=16,
                out_channels=4, num_blocks=1, num_heads=4, pe_mode="ape")
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng, jnp.zeros((1, 2, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 2, 3, 16)), jnp.zeros((1, 6, 14)),
        jnp.zeros((1, 8, 3)),
    )
    registry.save_params_npz(params, str(tmp_path / "dit.npz"))
    spec = {
        "name": "DiT",
        "args": dict(resolution=8, in_channels=4, model_channels=32,
                     static_cond_channels=14, image_cond_channels=16,
                     out_channels=4, num_blocks=1, num_heads=4, pe_mode="ape"),
        "weights": "dit.npz",
    }
    (tmp_path / "dit.json").write_text(json.dumps(spec))
    model2, params2 = registry.from_pretrained(str(tmp_path), "dit")
    assert model2.num_blocks == 1
    f1 = registry.flatten_tree(jax.tree.map(np.asarray, params))
    f2 = registry.flatten_tree(params2)
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_allclose(f1[k], f2[k])


def test_script_util():
    from gvfdiffusion_tpu.diffusion.gaussian_diffusion import create_diffusion
    from gvfdiffusion_tpu.utils.script_util import init_volume_grid, predict_x0_from_q

    grid = init_volume_grid(4)
    assert grid.shape == (64, 3)
    assert grid.min() > 0 and grid.max() < 1

    diff = create_diffusion(schedule="cosine", steps=100, mean_type="v")
    x0 = jnp.ones((2, 8)) * 0.3
    noise = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
    t = jnp.array([10, 50])
    v = diff.get_v(x0, noise, t)
    rec = predict_x0_from_q(diff, x0, t, noise, v)
    np.testing.assert_allclose(np.asarray(rec), 0.3, atol=1e-5)


def test_profiling_memory_kvs(tmp_path):
    from gvfdiffusion_tpu.utils import logger, profiling

    logger.configure(str(tmp_path), format_strs=["json"])
    profiling.log_memory_kvs()  # may be a no-op on CPU; must not raise
    logger.dumpkvs()


def test_render_4d_shapes():
    from gvfdiffusion_tpu.models.dit import DiT
    from gvfdiffusion_tpu.models.motion_vae import MotionVAE, pad_static_gs
    from gvfdiffusion_tpu.pipelines.video_to_4d import VideoTo4DConfig, VideoTo4DPipeline
    from gvfdiffusion_tpu.render.renderer import RenderOptions
    from gvfdiffusion_tpu.representations.gaussians import from_activated

    rng = jax.random.PRNGKey(0)
    G, T = 16, 2
    act = np.concatenate([
        np.random.default_rng(0).uniform(-0.2, 0.2, (G, 3)),
        np.full((G, 3), 0.02), np.tile([1.0, 0, 0, 0], (G, 1)),
        np.random.default_rng(1).uniform(-1, 1, (G, 3)),
        np.full((G, 1), 0.8),
    ], axis=1).astype(np.float32)
    gs = from_activated(jnp.asarray(act))
    dit = DiT(resolution=4, in_channels=4, model_channels=32,
              static_cond_channels=14, image_cond_channels=16,
              out_channels=4, num_blocks=1, num_heads=4)
    vae = MotionVAE(depth=1, dim=48, queries_dim=48, output_dim=14,
                    num_inputs=G, num_latents=4, latent_dim=4, heads=4, knn_k=4)
    static_gs, valid = pad_static_gs([act])
    dit_p = dit.init(rng, jnp.zeros((1, T, 4, 4)), jnp.zeros((1,)),
                     jnp.zeros((1, T, 3, 16)), static_gs[:, :4],
                     static_gs[:, :4, :3])
    vae_p = vae.init(rng, static_gs, valid, static_gs[..., :3],
                     jnp.zeros((1, T, G, 3)), rng)
    pipe = VideoTo4DPipeline(
        dit, dit_p, vae, vae_p,
        VideoTo4DConfig(steps=2, num_frames=T, num_latents=4, latent_dim=4),
        render_options=RenderOptions(near=0.1, far=10.0, use_mip=False,
                                     backend="binned", max_per_tile=16),
    )
    deltas = jnp.zeros((T, G, 14))
    frames = pipe.render_4d(gs, deltas, num_views=2, resolution=32)
    assert frames.shape == (T, 2, 32, 32, 3)
    assert np.isfinite(frames).all()
