"""Full in-the-wild pipeline composition test (tiny models) + DPM inverse."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.slow


def test_dpm_inverse_roundtrip():
    from gvfdiffusion_tpu.diffusion import gaussian_diffusion as gd
    from gvfdiffusion_tpu.diffusion.dpm_solver import DPMSolver, NoiseScheduleVP

    ns = NoiseScheduleVP.from_betas(gd.get_named_beta_schedule("linear", 1000))
    x0 = jnp.full((1, 8), 0.35)

    def oracle(x, t):
        t = jnp.broadcast_to(t, (x.shape[0],))
        a = ns.marginal_alpha(t).reshape(-1, 1)
        s = ns.marginal_std(t).reshape(-1, 1)
        return (x - a * x0) / s

    solver = DPMSolver(oracle, ns)
    x_start = x0 + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (1, 8))
    noise = solver.inverse(x_start, steps=30, order=2)
    back = solver.sample(noise, steps=30, order=2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x_start), atol=2e-2)


def test_in_the_wild_pipeline_tiny():
    from gvfdiffusion_tpu.models.dinov2 import DinoV2
    from gvfdiffusion_tpu.models.dit import DiT
    from gvfdiffusion_tpu.models.motion_vae import MotionVAE
    from gvfdiffusion_tpu.models.trellis.slat_decoders import SLatGaussianDecoder
    from gvfdiffusion_tpu.models.trellis.slat_flow import SLatFlowModel
    from gvfdiffusion_tpu.models.trellis.ss_flow import SparseStructureFlowModel
    from gvfdiffusion_tpu.models.trellis.ss_vae import SparseStructureDecoder
    from gvfdiffusion_tpu.pipelines.in_the_wild import InTheWildConfig, InTheWildPipeline
    from gvfdiffusion_tpu.pipelines.trellis_image_to_3d import (
        TrellisConfig, TrellisImageTo3DPipeline,
    )
    from gvfdiffusion_tpu.pipelines.video_to_4d import VideoTo4DConfig, VideoTo4DPipeline
    from gvfdiffusion_tpu.render.renderer import RenderOptions
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 12)
    CAP = 64          # voxel capacity -> gaussians = CAP * 8
    N_LAT, C_LAT, T, L_TOK = 8, 4, 2, 5

    dinov2 = DinoV2(img_size=28, patch_size=14, embed_dim=32, depth=1,
                    num_heads=4, num_register_tokens=2)
    dinov2_p = dinov2.init(ks[0], jnp.zeros((1, 28, 28, 3)))

    ss_flow = SparseStructureFlowModel(resolution=8, in_channels=4,
                                       model_channels=32, cond_channels=32,
                                       out_channels=4, num_blocks=1,
                                       num_heads=4, patch_size=2)
    ss_flow_p = ss_flow.init(ks[1], jnp.zeros((1, 8, 8, 8, 4)),
                             jnp.zeros((1,)), jnp.zeros((1, 7, 32)))
    ss_dec = SparseStructureDecoder(out_channels=1, latent_channels=4,
                                    num_res_blocks=1, channels=(16, 8))
    ss_dec_p = ss_dec.init(ks[2], jnp.zeros((1, 8, 8, 8, 4)))

    dummy_sv = from_lists([np.array([[1, 1, 1]])],
                          [np.zeros((1, 4), np.float32)], 16, capacity=CAP)
    slat_flow = SLatFlowModel(resolution=16, in_channels=4, model_channels=32,
                              cond_channels=32, out_channels=4, num_blocks=1,
                              num_heads=4, patch_size=2, num_io_res_blocks=2,
                              io_block_channels=(16,))
    slat_flow_p = slat_flow.init(ks[3], dummy_sv, jnp.zeros((1,)),
                                 jnp.zeros((1, 7, 32)))
    slat_dec = SLatGaussianDecoder(resolution=16, model_channels=32,
                                   latent_channels=4, num_blocks=1,
                                   num_heads=4, window_size=4)
    slat_dec_p = slat_dec.init(ks[4], dummy_sv)

    trellis = TrellisImageTo3DPipeline(
        dinov2, dinov2_p, ss_flow, ss_flow_p, ss_dec, ss_dec_p,
        slat_flow, slat_flow_p, slat_dec, slat_dec_p,
        TrellisConfig(ss_steps=2, slat_steps=2, ss_resolution=8,
                      grid_resolution=16, voxel_capacity=CAP),
    )
    # tiny dinov2 expects 28x28 inputs; shrink preprocess output via wrapper
    orig_encode = trellis.encode_image
    trellis.encode_image = lambda imgs: orig_encode(
        jax.image.resize(imgs, (imgs.shape[0], 28, 28, 3), "bilinear")
    )

    G = CAP * 8
    dit = DiT(resolution=N_LAT, in_channels=C_LAT, model_channels=32,
              static_cond_channels=14, image_cond_channels=32,
              out_channels=C_LAT, num_blocks=1, num_heads=4)
    vae = MotionVAE(depth=1, dim=48, queries_dim=48, output_dim=14,
                    num_inputs=G, num_latents=N_LAT, latent_dim=C_LAT,
                    heads=4, knn_k=4)
    cond_images = jax.random.normal(ks[5], (T, L_TOK, 32))
    dit_p = dit.init(ks[6], jnp.zeros((1, T, N_LAT, C_LAT)), jnp.zeros((1,)),
                     cond_images[None], jnp.zeros((1, N_LAT, 14)),
                     jnp.zeros((1, N_LAT, 3)))
    vae_p = vae.init(ks[7], jnp.zeros((1, G, 14)),
                     jnp.ones((1, G), bool), jnp.zeros((1, G, 3)),
                     jnp.zeros((1, T, G, 3)), ks[8])
    v4d = VideoTo4DPipeline(
        dit, dit_p, vae, vae_p,
        VideoTo4DConfig(steps=2, num_frames=T, num_latents=N_LAT,
                        latent_dim=C_LAT),
    )

    pipe = InTheWildPipeline(
        trellis, v4d,
        InTheWildConfig(num_latents=N_LAT, align_n_angles=4,
                        render_views=2, render_resolution=32),
        render_options=RenderOptions(near=0.1, far=10.0, use_mip=False,
                                     backend="binned", max_per_tile=32),
    )

    img = np.zeros((40, 40, 4), np.float32)
    img[10:30, 10:30, :3] = 0.6
    img[10:30, 10:30, 3] = 1.0
    result = pipe.run(img, cond_images, ks[9], align=True, synthetic=True)
    assert result["deltas"].shape == (1, T, G, 14)
    assert np.isfinite(np.asarray(result["latent"])).all()
    assert np.isfinite(result["align_angle"])

    frames = pipe.render_outputs(result, "/tmp/itw_out", fps=4)
    assert frames.shape == (T, 2, 32, 32, 3)
    assert np.isfinite(frames).all()
