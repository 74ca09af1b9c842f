"""Composed end-to-end golden tests vs the torch reference.

Stage-level parity (test_torch_parity.py) proves each model maps; these
tests prove the INTER-STAGE contracts: noise wiring, t conventions (x1000),
occupancy thresholding, slat mean/std normalization, channel orders.

(a) TRELLIS chain: ss-flow sample -> ss-decode -> occupancy -> slat-flow
    sample -> normalization -> GS decode, same weights + same noise on both
    frameworks, compared on the final gaussian attributes.
    Anchor: /root/reference/trellis/pipelines/trellis_image_to_3d.py:165-284.
(b) GVF chain: DPM-Solver++ multistep sampling of the DiT latent followed by
    the motion-VAE delta decode.
    Anchor: /root/reference/inference_dpm_latent.py:168-273.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_loader

torch = pytest.importorskip("torch")

from gvfdiffusion_tpu.utils import weight_convert as wc


def _randomize(module, seed=0, scale=0.2):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for _, p in module.named_parameters():
            if p.dtype.is_floating_point:
                p.copy_(torch.randn(p.shape, generator=g, dtype=p.dtype) * scale)
    return module


def _np(x):
    return x.detach().cpu().numpy()


def test_trellis_composed_golden():
    """Same weights + same noise through the COMPOSED ss->slat->GS pipeline
    must give the same gaussians (catches occupancy/order/normalization/t
    contract drift that stage tests cannot)."""
    import functools

    ssf = ref_loader.load_trellis("trellis.models.sparse_structure_flow")
    ssv = ref_loader.load_trellis("trellis.models.sparse_structure_vae")
    slf = ref_loader.load_trellis("trellis.models.structured_latent_flow")
    dgs = ref_loader.load_trellis(
        "trellis.models.structured_latent_vae.decoder_gs")
    samplers = ref_loader.load_trellis("trellis.pipelines.samplers")
    sp_mod = ref_loader.load_trellis("trellis.modules.sparse")
    dgs.Gaussian = functools.partial(dgs.Gaussian, device="cpu")

    SS_RES, GRID_RES, COND = 4, 8, 16

    t_ss_flow = _randomize(ssf.SparseStructureFlowModel(
        resolution=SS_RES, in_channels=4, model_channels=32,
        cond_channels=COND, out_channels=4, num_blocks=2, num_heads=4,
        patch_size=2, qk_rms_norm=True), seed=50, scale=0.1).eval()
    t_ss_dec = _randomize(ssv.SparseStructureDecoder(
        out_channels=1, latent_channels=4, num_res_blocks=1,
        channels=[16, 8], num_res_blocks_middle=1, norm_type="layer"),
        seed=51, scale=0.1).eval()
    t_slat_flow = _randomize(slf.SLatFlowModel(
        resolution=GRID_RES, in_channels=4, model_channels=32,
        cond_channels=COND, out_channels=4, num_blocks=2, num_heads=4,
        patch_size=2, num_io_res_blocks=2, io_block_channels=[8],
        qk_rms_norm=True), seed=52, scale=0.1).eval()
    rep_cfg = dict(
        num_gaussians=8, voxel_size=1.5, scaling_bias=0.004,
        opacity_bias=0.1, scaling_activation="softplus", perturb_offset=True,
        lr={"_xyz": 1.0, "_features_dc": 1.0, "_scaling": 1.0,
            "_rotation": 0.1, "_opacity": 1.0},
        **{"3d_filter_kernel_size": 9e-4},
    )
    t_gs_dec = _randomize(dgs.SLatGaussianDecoder(
        resolution=GRID_RES, model_channels=32, latent_channels=4,
        num_blocks=2, num_heads=4, attn_mode="swin", window_size=4,
        representation_config=rep_cfg), seed=53, scale=0.1).eval()

    gen = torch.Generator().manual_seed(60)
    cond = torch.randn(1, 5, COND, generator=gen)
    neg_cond = torch.zeros_like(cond)
    ss_noise = torch.randn(1, 4, SS_RES, SS_RES, SS_RES, generator=gen)
    slat_mean = torch.randn(4, generator=gen) * 0.3
    slat_std = torch.rand(4, generator=gen) + 0.5

    # ---- torch composed chain (mirrors trellis_image_to_3d.py:165-284)
    ss_sampler = samplers.FlowEulerGuidanceIntervalSampler(sigma_min=0.0)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        with torch.no_grad():
            z_s = ss_sampler.sample(
                t_ss_flow, ss_noise, cond=cond, neg_cond=neg_cond, steps=4,
                cfg_strength=7.5, cfg_interval=(0.0, 1.0), rescale_t=3.0,
                verbose=False).samples
            occ_logits = t_ss_dec(z_s)
            coords = torch.argwhere(occ_logits > 0)[:, [0, 2, 3, 4]].int()
            n_occ = coords.shape[0]
            assert n_occ > 0, "degenerate test: no occupied voxels"
            slat_noise = torch.randn(n_occ, 4, generator=gen)
            noise_sp = sp_mod.SparseTensor(feats=slat_noise, coords=coords)
            slat = ss_sampler.sample(
                t_slat_flow, noise_sp, cond=cond, neg_cond=neg_cond, steps=4,
                cfg_strength=3.0, cfg_interval=(0.5, 1.0), rescale_t=3.0,
                verbose=False).samples
            slat = slat * slat_std[None] + slat_mean[None]
            t_gs = t_gs_dec(slat)[0]
    finally:
        torch.Tensor.cuda = orig_cuda

    # ---- my composed pipeline with converted weights + injected noise
    from gvfdiffusion_tpu.models.sparse_vae import GSConfig
    from gvfdiffusion_tpu.models.trellis.slat_decoders import SLatGaussianDecoder
    from gvfdiffusion_tpu.models.trellis.slat_flow import SLatFlowModel
    from gvfdiffusion_tpu.models.trellis.ss_flow import SparseStructureFlowModel
    from gvfdiffusion_tpu.models.trellis.ss_vae import SparseStructureDecoder
    from gvfdiffusion_tpu.pipelines.trellis_image_to_3d import (
        TrellisConfig, TrellisImageTo3DPipeline,
    )

    m_ss_flow = SparseStructureFlowModel(
        resolution=SS_RES, in_channels=4, model_channels=32,
        cond_channels=COND, out_channels=4, num_blocks=2, num_heads=4,
        patch_size=2, qk_rms_norm=True)
    m_ss_dec = SparseStructureDecoder(
        out_channels=1, latent_channels=4, num_res_blocks=1,
        channels=(16, 8), num_res_blocks_middle=1, norm_type="layer")
    m_slat_flow = SLatFlowModel(
        resolution=GRID_RES, in_channels=4, model_channels=32,
        cond_channels=COND, out_channels=4, num_blocks=2, num_heads=4,
        patch_size=2, num_io_res_blocks=2, io_block_channels=(8,),
        qk_rms_norm=True)
    m_gs_dec = SLatGaussianDecoder(
        resolution=GRID_RES, model_channels=32, latent_channels=4,
        num_blocks=2, num_heads=4, attn_mode="swin", window_size=4,
        rep_config=GSConfig(num_gaussians=8, voxel_size=1.5,
                            scaling_bias=0.004, opacity_bias=0.1,
                            scaling_activation="softplus",
                            filter_3d_kernel_size=9e-4, lr_rotation=0.1))

    J = jax.tree.map
    pipe = TrellisImageTo3DPipeline(
        None, None,
        m_ss_flow, J(jnp.asarray, wc.convert_ss_flow(
            {k: _np(v) for k, v in t_ss_flow.state_dict().items()},
            num_blocks=2, in_channels=4, out_channels=4, patch_size=2,
            qk_rms_norm=True)),
        m_ss_dec, J(jnp.asarray, wc.convert_ss_decoder(
            {k: _np(v) for k, v in t_ss_dec.state_dict().items()},
            channels=(16, 8), num_res_blocks=1, num_res_blocks_middle=1)),
        m_slat_flow, J(jnp.asarray, wc.convert_slat_flow(
            {k: _np(v) for k, v in t_slat_flow.state_dict().items()},
            num_blocks=2, io_block_channels=(8,), num_io_res_blocks=2,
            qk_rms_norm=True)),
        m_gs_dec, J(jnp.asarray, wc.convert_slat_gs_decoder(
            {k: _np(v) for k, v in t_gs_dec.state_dict().items()},
            num_blocks=2)),
        TrellisConfig(ss_steps=4, ss_cfg=7.5, slat_steps=4, slat_cfg=3.0,
                      slat_cfg_interval=(0.5, 1.0), ss_resolution=SS_RES,
                      grid_resolution=GRID_RES,
                      voxel_capacity=GRID_RES**3, rescale_t=3.0),
        slat_mean=jnp.asarray(_np(slat_mean)),
        slat_std=jnp.asarray(_np(slat_std)),
    )

    m_cond = jnp.asarray(_np(cond))
    rng = jax.random.PRNGKey(0)  # unused: noise injected
    structure = pipe.sample_sparse_structure(
        m_cond, rng, noise=jnp.asarray(_np(ss_noise).transpose(0, 2, 3, 4, 1)))

    # my occupied slots (ascending linear order) must equal torch argwhere
    m_coords = np.asarray(structure.coords[0])
    m_valid = np.asarray(structure.valid[0])
    got = m_coords[m_valid]
    np.testing.assert_array_equal(got, _np(coords)[:, 1:])

    # inject the torch slat noise into the matching slots
    noise_feats = np.zeros((1, structure.capacity, 4), np.float32)
    noise_feats[0, : n_occ] = _np(slat_noise)
    slat_m = pipe.sample_slat(structure, m_cond, rng,
                              noise_feats=jnp.asarray(noise_feats))
    m_gs, _ = pipe.decode_slat(slat_m)

    g = 8
    for li in range(n_occ):
        for attr in ["_xyz", "_features_dc", "_scaling", "_rotation",
                     "_opacity"]:
            t_v = _np(getattr(t_gs, attr))[li * g:(li + 1) * g]
            m_v = np.asarray(getattr(m_gs, attr))[0, li * g:(li + 1) * g]
            np.testing.assert_allclose(
                m_v, t_v, rtol=2e-3, atol=2e-3,
                err_msg=f"composed {attr} voxel {li}",
            )


def test_gvf_composed_dpm_vae_golden():
    """GVF composed chain: DPM-Solver++ multistep sampling of the DiT motion
    latent (3-way dual-scale CFG), deformation denormalization, then the
    motion-VAE delta decode — same weights + same noise both frameworks,
    compared on the final per-gaussian deltas.
    Anchor: /root/reference/inference_dpm_latent.py:168-273."""
    ref_dit = ref_loader.load_ref("model.dit")
    ref_dpm = ref_loader.load_ref("model.dpmsolver")
    ref_ae = ref_loader.load_ref("model.autoencoder")
    ref_gd = ref_loader.load_ref("model.gaussian_diffusion")

    from gvfdiffusion_tpu.diffusion import dpm_solver as my_dpm
    from gvfdiffusion_tpu.diffusion.gaussian_diffusion import (
        get_named_beta_schedule,
    )
    from gvfdiffusion_tpu.models.dit import DiT
    from gvfdiffusion_tpu.models.motion_vae import MotionVAE, pad_static_gs

    B, T, N, Cin, L, Ns = 1, 3, 8, 4, 5, 4
    dit_cfg = dict(
        resolution=N, in_channels=Cin, model_channels=32,
        static_cond_channels=14, image_cond_channels=9, out_channels=Cin,
        num_blocks=2, num_heads=4, pe_mode="ape", share_mod=False,
        qk_rms_norm=True, no_temporal_attn=False,
    )
    t_dit = _randomize(ref_dit.DiT(num_head_channels=8, **dit_cfg),
                       seed=70, scale=0.15).eval()
    vae_kw = dict(depth=2, dim=24, queries_dim=24, input_dim=3, gs_dim=14,
                  output_dim=14, num_inputs=32, num_latents=N,
                  latent_dim=Cin, heads=4, knn_k=4, beta=7.0)
    t_vae = _randomize(ref_ae.GSKLTemporalVariationalAutoEncoder(
        num_timesteps=T, dim_head=-1, chunk_size=8192, **vae_kw),
        seed=71).eval()

    rng = np.random.default_rng(72)
    G = 16
    gs_list = [rng.normal(size=(G, 14)).astype(np.float32)]
    static4096 = rng.normal(size=(B, Ns, 14)).astype(np.float32)
    positions = rng.normal(size=(B, N, 3)).astype(np.float32)
    cond_images = rng.normal(size=(B, T, L, 9)).astype(np.float32)
    noise = rng.normal(size=(B, T, N, Cin)).astype(np.float32)
    d_mean = rng.normal(size=(Cin,)).astype(np.float32) * 0.2
    d_std = (rng.uniform(0.5, 1.5, size=(Cin,))).astype(np.float32)

    betas = get_named_beta_schedule("cosine", 100)

    # ---- torch chain
    ns_t = ref_dpm.NoiseScheduleVP(
        "discrete", betas=torch.tensor(betas, dtype=torch.float64))
    static_t = torch.tensor(static4096[..., :14])
    condition = {
        "cond_images": torch.tensor(cond_images),
        "static_latent": static_t,
        "deformation_position_xyz": torch.tensor(positions),
    }
    uncond = {
        "cond_images": torch.zeros_like(condition["cond_images"]),
        "static_latent": static_t,
        "deformation_position_xyz": torch.tensor(positions),
    }
    fn_t = ref_dpm.model_wrapper(
        t_dit, ns_t, model_type="v", guidance_type="classifier-free",
        condition=condition, unconditional_condition=uncond,
        guidance_scale=2.0, guidance_scale2=5.0,
    )
    solver_t = ref_dpm.DPM_Solver(fn_t, ns_t, algorithm_type="dpmsolver++")
    with torch.no_grad():
        samples_t = solver_t.sample(
            torch.tensor(noise), steps=4, t_start=1.0, t_end=1 / 100,
            order=2, skip_type="time_uniform", method="multistep",
        )
        samples_t = samples_t * torch.tensor(d_std) + torch.tensor(d_mean)
        z_t = samples_t.reshape(B * T, N, Cin)
        delta_t = t_vae.decode(
            z_t, torch.stack([torch.tensor(g) for g in gs_list]))

    # ---- my chain with converted weights + the same noise
    dit_params = jax.tree.map(jnp.asarray, wc.convert_dit(
        t_dit.state_dict(), num_blocks=2, qk_rms_norm=True,
        no_temporal_attn=False, share_mod=False))
    vae_params = jax.tree.map(
        jnp.asarray, wc.convert_motion_vae(t_vae.state_dict(), depth=2))
    m_dit = DiT(**dit_cfg)
    m_vae = MotionVAE(**vae_kw)

    ns_m = my_dpm.NoiseScheduleVP.from_betas(betas)

    def jmodel(x, t_input, cond_images=None, static_latent=None,
               positions=None):
        return m_dit.apply(dit_params, x, t_input, cond_images,
                           static_latent, positions)

    fn_m = my_dpm.model_wrapper(
        jmodel, ns_m, model_type="v", guidance_type="classifier-free",
        condition={"cond_images": jnp.asarray(cond_images),
                   "static_latent": jnp.asarray(static4096),
                   "positions": jnp.asarray(positions)},
        unconditional_condition={
            "cond_images": jnp.zeros_like(jnp.asarray(cond_images)),
            "static_latent": jnp.asarray(static4096),
            "positions": jnp.asarray(positions)},
        guidance_scale=2.0, guidance_scale2=5.0,
    )
    solver_m = my_dpm.DPMSolver(fn_m, ns_m, algorithm_type="dpmsolver++")
    samples_m = solver_m.sample(
        jnp.asarray(noise), steps=4, t_start=1.0, t_end=1 / 100, order=2,
        skip_type="time_uniform", method="multistep",
    )
    samples_m = samples_m * jnp.asarray(d_std) + jnp.asarray(d_mean)
    z_m = samples_m.reshape(B * T, N, Cin)
    padded, _ = pad_static_gs(gs_list)
    delta_m = m_vae.apply(vae_params, z_m, padded, T, method=m_vae.decode)

    np.testing.assert_allclose(
        np.asarray(samples_m), _np(samples_t), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(delta_m), _np(delta_t).reshape(B, T, G, -1),
        rtol=2e-3, atol=2e-3)
