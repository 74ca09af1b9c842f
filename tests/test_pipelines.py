"""Pipeline smoke tests: TRELLIS image->3D (tiny models) and video->4D."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.models.dinov2 import DinoV2
from gvfdiffusion_tpu.models.dit import DiT
from gvfdiffusion_tpu.models.motion_vae import MotionVAE, pad_static_gs
from gvfdiffusion_tpu.models.trellis.slat_decoders import SLatGaussianDecoder
from gvfdiffusion_tpu.models.trellis.slat_flow import SLatFlowModel
from gvfdiffusion_tpu.models.trellis.ss_flow import SparseStructureFlowModel
from gvfdiffusion_tpu.models.trellis.ss_vae import SparseStructureDecoder
from gvfdiffusion_tpu.pipelines.trellis_image_to_3d import (
    TrellisConfig, TrellisImageTo3DPipeline,
)
from gvfdiffusion_tpu.pipelines.video_to_4d import VideoTo4DConfig, VideoTo4DPipeline


@pytest.mark.slow
def test_trellis_pipeline_tiny_end_to_end():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)

    dinov2 = DinoV2(img_size=28, patch_size=14, embed_dim=32, depth=1,
                    num_heads=4, num_register_tokens=2)
    img = jax.random.uniform(ks[0], (1, 28, 28, 3))
    dinov2_p = dinov2.init(ks[1], img)

    ss_flow = SparseStructureFlowModel(
        resolution=8, in_channels=4, model_channels=32, cond_channels=32,
        out_channels=4, num_blocks=1, num_heads=4, patch_size=2,
    )
    ss_flow_p = ss_flow.init(
        ks[2], jnp.zeros((1, 8, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 7, 32)),
    )

    ss_dec = SparseStructureDecoder(out_channels=1, latent_channels=4,
                                    num_res_blocks=1, channels=(16, 8))
    ss_dec_p = ss_dec.init(ks[3], jnp.zeros((1, 8, 8, 8, 4)))

    slat_flow = SLatFlowModel(
        resolution=16, in_channels=4, model_channels=32, cond_channels=32,
        out_channels=4, num_blocks=1, num_heads=4, patch_size=2,
        num_io_res_blocks=2, io_block_channels=(16,),
    )
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    dummy_sv = from_lists(
        [np.array([[1, 1, 1], [2, 2, 2]])],
        [np.zeros((2, 4), np.float32)], resolution=16, capacity=64,
    )
    slat_flow_p = slat_flow.init(
        ks[4], dummy_sv, jnp.zeros((1,)), jnp.zeros((1, 7, 32))
    )

    slat_dec = SLatGaussianDecoder(
        resolution=16, model_channels=32, latent_channels=4, num_blocks=1,
        num_heads=4, window_size=4,
    )
    slat_dec_p = slat_dec.init(ks[5], dummy_sv)

    pipe = TrellisImageTo3DPipeline(
        dinov2, dinov2_p, ss_flow, ss_flow_p, ss_dec, ss_dec_p,
        slat_flow, slat_flow_p, slat_dec, slat_dec_p,
        TrellisConfig(ss_steps=2, slat_steps=2, ss_resolution=8,
                      grid_resolution=16, voxel_capacity=64),
    )

    # preprocessing: RGBA with a centered square object
    img_np = np.zeros((40, 40, 4), np.float32)
    img_np[10:30, 10:30, :3] = 0.5
    img_np[10:30, 10:30, 3] = 1.0
    pre = pipe.preprocess_image(img_np)
    assert pre.shape == (518, 518, 3)

    cond = pipe.encode_image(jax.image.resize(jnp.asarray(pre), (28, 28, 3), "bilinear")[None])
    assert cond.shape[0] == 1 and cond.shape[2] == 32

    structure = pipe.sample_sparse_structure(cond, ks[6])
    assert structure.resolution == 16

    slat = pipe.sample_slat(structure, cond, ks[7])
    assert slat.feats.shape[-1] == 4

    gs, valid = pipe.decode_slat(slat)
    assert gs._xyz.shape[1] == 64 * 8
    assert np.isfinite(np.asarray(gs._xyz)).all()


def test_video_to_4d_pipeline_run():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 6)
    B, T, G, N_lat, C_lat, L = 1, 2, 32, 8, 4, 5

    dit = DiT(
        resolution=N_lat, in_channels=C_lat, model_channels=32,
        static_cond_channels=14, image_cond_channels=16, out_channels=C_lat,
        num_blocks=1, num_heads=4, pe_mode="ape", qk_rms_norm=True,
    )
    vae = MotionVAE(depth=1, dim=48, queries_dim=48, output_dim=14,
                    num_inputs=G, num_latents=N_lat, latent_dim=C_lat,
                    heads=4, knn_k=4)

    gs_act = np.random.default_rng(0).normal(size=(G, 14)).astype(np.float32)
    static_gs, valid = pad_static_gs([gs_act])
    cond_images = jax.random.normal(ks[0], (B, T, L, 16))

    dit_p = dit.init(
        ks[1], jnp.zeros((B, T, N_lat, C_lat)), jnp.zeros((B,)),
        cond_images, static_gs[:, :N_lat], static_gs[:, :N_lat, :3],
    )
    vae_p = vae.init(
        ks[2], static_gs, valid, static_gs[..., :3],
        jnp.zeros((B, T, G, 3)), ks[3],
    )

    pipe = VideoTo4DPipeline(
        dit, dit_p, vae, vae_p,
        VideoTo4DConfig(steps=4, order=2, num_frames=T, num_latents=N_lat,
                        latent_dim=C_lat),
    )
    out = pipe.run(static_gs, valid, cond_images, ks[4])
    assert out["latent"].shape == (B, T, N_lat, C_lat)
    assert out["deltas"].shape == (B, T, G, 14)
    assert out["anchors"].shape == (B, N_lat, 14)
    assert np.isfinite(np.asarray(out["latent"])).all()


def test_inference_utils_alignment():
    from gvfdiffusion_tpu.render.renderer import GaussianRenderer, RenderOptions
    from gvfdiffusion_tpu.representations.gaussians import from_activated
    from gvfdiffusion_tpu.utils.inference_utils import (
        align_gaussian_to_canonical, rotate_gaussians_z, sample_gs,
    )

    # asymmetric object: two blobs offset in +x
    act = np.zeros((2, 14), np.float32)
    act[:, 0] = [0.15, 0.25]
    act[:, 3:6] = 0.04
    act[:, 6] = 1.0
    act[:, 10:13] = [[1.0, -1.0, -1.0]] * 2  # red-ish
    act[:, 13] = 0.95
    gs = from_activated(jnp.asarray(act))

    renderer = GaussianRenderer(RenderOptions(
        near=0.1, far=10.0, bg_color=(1.0, 1.0, 1.0), use_mip=False,
        backend="binned", max_per_tile=8,
    ))
    cam_kwargs = dict(radius=1.5, fov_deg=45.0)
    from gvfdiffusion_tpu.representations.camera import orbit_camera

    # target = object rotated by 90 degrees
    true_angle = np.pi / 2
    gt = rotate_gaussians_z(gs, jnp.float32(true_angle))
    cam = orbit_camera(0.0, 0.0, height=32, width=32, **cam_kwargs)
    target = renderer.render(gt, cam)["render"]

    aligned, angle, scale = align_gaussian_to_canonical(
        gs, target, n_angles=16, renderer=renderer, camera_kwargs=cam_kwargs,
    )
    # found angle within one grid step of the truth
    step = 2 * np.pi / 16
    diff = abs(((angle - true_angle) + np.pi) % (2 * np.pi) - np.pi)
    assert diff <= step + 1e-6

    # sample_gs picks a subset
    sub = sample_gs(jnp.asarray(act)[None], jnp.ones((1, 2), bool), 1)
    assert sub.shape == (1, 1, 14)


def test_trellis_pipeline_multiformat_decode():
    """decode_slat_formats returns gaussian + mesh + radiance_field outputs
    (reference pipelines/trellis_image_to_3d.py:198-220), and the RF output
    renders through the octree renderer."""
    from gvfdiffusion_tpu.models.trellis.slat_mesh_decoder import SLatMeshDecoder
    from gvfdiffusion_tpu.models.trellis.slat_rf_decoder import (
        SLatRadianceFieldDecoder,
    )
    from gvfdiffusion_tpu.render.octree_renderer import (
        OctreeRenderer, OctreeRenderOptions,
    )
    from gvfdiffusion_tpu.representations.camera import orbit_camera
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    slat = from_lists(
        [np.array([[4, 4, 4], [5, 4, 4], [4, 5, 4]])],
        [np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32)],
        resolution=16, capacity=16,
    )

    kw = dict(resolution=16, model_channels=32, latent_channels=4,
              num_blocks=1, num_heads=4, window_size=4)
    gs_dec = SLatGaussianDecoder(**kw)
    gs_p = gs_dec.init(ks[0], slat)
    mesh_dec = SLatMeshDecoder(use_subdivide=False, **kw)
    mesh_p = mesh_dec.init(ks[1], slat)
    rf_dec = SLatRadianceFieldDecoder(rank=2, dim=4, **kw)
    rf_p = rf_dec.init(ks[2], slat)

    dinov2 = DinoV2(img_size=28, patch_size=14, embed_dim=32, depth=1,
                    num_heads=4, num_register_tokens=2)
    pipe = TrellisImageTo3DPipeline(
        dinov2, None, None, None, None, None, None, None, gs_dec, gs_p,
        TrellisConfig(grid_resolution=16, voxel_capacity=16),
        slat_decoder_mesh=mesh_dec, slat_decoder_mesh_params=mesh_p,
        slat_decoder_rf=rf_dec, slat_decoder_rf_params=rf_p,
    )
    out = pipe.decode_slat_formats(
        slat, formats=("gaussian", "mesh", "radiance_field")
    )
    assert set(out) == {"gaussian", "mesh", "radiance_field"}
    gs, valid = out["gaussian"]
    assert np.isfinite(np.asarray(gs._xyz)).all()
    sdf, deform, _res = out["mesh"]
    assert sdf.shape[1:] == (17, 17, 17) and deform.shape[-1] == 3
    strivec = out["radiance_field"]
    assert strivec.trivec.shape[1:] == (2, 3, 4)

    cam = orbit_camera(10.0, 15.0, radius=1.6, height=16, width=16,
                       target=(0.5, 0.5, 0.5))
    r = OctreeRenderer(OctreeRenderOptions(num_steps=32))
    img = r.render(strivec, cam)
    assert np.isfinite(np.asarray(img["color"])).all()
    assert "percent_depth" in img


def test_alignment_coarse_to_fine_matches_single_stage():
    """The two-stage (coarse half-res -> refine) search must find the same
    angle as the exhaustive full-res sweep. (The coarse stage needs enough
    pixels to see the object: production targets are 512^2 with coarse 128;
    here 48^2 with coarse 24.)"""
    from gvfdiffusion_tpu.render.renderer import GaussianRenderer, RenderOptions
    from gvfdiffusion_tpu.representations.camera import orbit_camera
    from gvfdiffusion_tpu.representations.gaussians import from_activated
    from gvfdiffusion_tpu.utils.inference_utils import (
        align_gaussian_to_canonical, rotate_gaussians_z,
    )

    act = np.zeros((2, 14), np.float32)
    act[:, 0] = [0.15, 0.25]
    act[:, 3:6] = 0.04
    act[:, 6] = 1.0
    act[:, 10:13] = [[1.0, -1.0, -1.0]] * 2
    act[:, 13] = 0.95
    gs = from_activated(jnp.asarray(act))
    renderer = GaussianRenderer(RenderOptions(
        near=0.1, far=10.0, bg_color=(1.0, 1.0, 1.0), use_mip=False,
        backend="binned", max_per_tile=8,
    ))
    cam_kwargs = dict(radius=1.5, fov_deg=45.0)
    true_angle = 2 * np.pi * 5 / 16
    gt = rotate_gaussians_z(gs, jnp.float32(true_angle))
    cam = orbit_camera(0.0, 0.0, height=48, width=48, **cam_kwargs)
    target = renderer.render(gt, cam)["render"]

    kw = dict(n_angles=16, renderer=renderer, camera_kwargs=cam_kwargs)
    _, a_full, _ = align_gaussian_to_canonical(
        gs, target, coarse_res=64, **kw)   # coarse >= res: single stage
    _, a_two, _ = align_gaussian_to_canonical(
        gs, target, coarse_res=24, refine=2, **kw)
    assert abs(a_full - a_two) < 1e-6
    step = 2 * np.pi / 16
    diff = abs(((a_two - true_angle) + np.pi) % (2 * np.pi) - np.pi)
    assert diff <= step + 1e-6


def test_clip_score_fn_plugs_into_alignment():
    """CLIPImageEncoder's score hook drives align_gaussian_to_canonical's
    clip_weight term (reference inference_utils.py:48,105-130)."""
    from gvfdiffusion_tpu.models.clip import CLIPImageEncoder, make_clip_score_fn
    from gvfdiffusion_tpu.render.renderer import GaussianRenderer, RenderOptions
    from gvfdiffusion_tpu.representations.gaussians import from_activated
    from gvfdiffusion_tpu.utils.inference_utils import align_gaussian_to_canonical

    clip = CLIPImageEncoder(image_size=32, patch_size=8, width=16, depth=1,
                            heads=2, embed_dim=8)
    img0 = np.random.default_rng(0).uniform(0, 1, (32, 32, 3)).astype(np.float32)
    cparams = clip.init(jax.random.PRNGKey(0), jnp.asarray(img0)[None])

    score = make_clip_score_fn(clip, cparams, img0)
    sims = score(np.stack([img0, 1.0 - img0]))
    assert sims.shape == (2,)
    assert sims[0] > 0.999  # target scores itself perfectly

    act = np.zeros((2, 14), np.float32)
    act[:, 0] = [0.15, 0.25]
    act[:, 3:6] = 0.04
    act[:, 6] = 1.0
    act[:, 13] = 0.9
    gs = from_activated(jnp.asarray(act))
    renderer = GaussianRenderer(RenderOptions(
        near=0.1, far=10.0, bg_color=(1.0, 1.0, 1.0), use_mip=False,
        backend="binned", max_per_tile=8,
    ))
    aligned, angle, scale = align_gaussian_to_canonical(
        gs, jnp.asarray(img0), n_angles=4, renderer=renderer,
        camera_kwargs=dict(radius=1.5, fov_deg=45.0),
        clip_score_fn=score, clip_weight=0.2,
    )
    assert np.isfinite(np.asarray(aligned.get_xyz)).all()
