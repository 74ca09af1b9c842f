"""Golden numeric parity vs the torch reference, run directly from
/root/reference on CPU (torch 2.13+cpu is in this image; GPU-only deps are
stubbed with exact pure-torch equivalents — see ref_loader.py).

These tests turn utils/weight_convert.py from "structurally tested" into
"numerically proven": the same random state dict drives both frameworks and
outputs must agree. Reference anchors:
  model/gaussian_diffusion.py:128   GaussianDiffusion
  model/dit.py:306                  DiT
  model/autoencoder.py:345          GSKLTemporalVariationalAutoEncoder
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_loader

torch = pytest.importorskip("torch")

from gvfdiffusion_tpu.diffusion import gaussian_diffusion as my_gd
from gvfdiffusion_tpu.utils import weight_convert as wc


def _randomize(module, seed=0, scale=0.2):
    """Fill every parameter with deterministic gaussian noise (zero-inits and
    xavier inits would leave adaLN/final-layer paths numerically untested)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        # parameters only — buffers (e.g. PointEmbed omega) hold fixed
        # constants both frameworks must compute identically
        for _, p in module.named_parameters():
            if p.dtype.is_floating_point:
                p.copy_(torch.randn(p.shape, generator=g, dtype=p.dtype) * scale)
    return module


def _np(x):
    return x.detach().cpu().numpy()


# ---------------------------------------------------------------- schedules


def test_beta_schedules_match():
    ref = ref_loader.load_ref("model.gaussian_diffusion")
    for name in ("linear", "cosine", "sigmoid"):
        mine = my_gd.get_named_beta_schedule(name, 50)
        theirs = ref.get_named_beta_schedule(name, 50)
        np.testing.assert_allclose(mine, theirs, rtol=1e-12, atol=1e-12, err_msg=name)


def test_respacing_matches():
    ref_rs = ref_loader.load_ref("model.respace")
    from gvfdiffusion_tpu.diffusion import respace as my_rs

    for spec in ("ddim8", "10", "5,3,2"):
        mine = sorted(my_rs.space_timesteps(40, spec))
        theirs = sorted(ref_rs.space_timesteps(40, spec))
        assert mine == theirs, spec


# ---------------------------------------------------------- diffusion process


def _pair(mean_type, var_type, steps=20, min_snr=False):
    ref = ref_loader.load_ref("model.gaussian_diffusion")
    betas = my_gd.get_named_beta_schedule("cosine", steps)
    mt = {
        "eps": ref.ModelMeanType.EPSILON,
        "x0": ref.ModelMeanType.START_X,
        "v": ref.ModelMeanType.V,
        "xprev": ref.ModelMeanType.PREVIOUS_X,
    }[mean_type]
    vt = {
        "fixed_small": ref.ModelVarType.FIXED_SMALL,
        "fixed_large": ref.ModelVarType.FIXED_LARGE,
        "learned_range": ref.ModelVarType.LEARNED_RANGE,
        "learned": ref.ModelVarType.LEARNED,
    }[var_type]
    theirs = ref.GaussianDiffusion(
        betas=betas, model_mean_type=mt, model_var_type=vt,
        loss_type=ref.LossType.MSE, min_snr=min_snr,
    )
    mine = my_gd.create_diffusion(
        betas=betas, steps=steps, mean_type=mean_type, var_type=var_type,
        min_snr=min_snr,
    )
    return mine, theirs


def test_q_process_parity():
    mine, theirs = _pair("eps", "fixed_small")
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)
    xt = rng.normal(size=x0.shape).astype(np.float32)
    noise = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([0, 17])

    np.testing.assert_allclose(
        np.asarray(mine.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))),
        _np(theirs.q_sample(torch.tensor(x0), torch.tensor(t), torch.tensor(noise))),
        rtol=1e-5, atol=1e-6,
    )
    m_mean, m_var = mine.q_mean_variance(jnp.asarray(x0), jnp.asarray(t))[:2]
    t_mean, t_var, _ = theirs.q_mean_variance(torch.tensor(x0), torch.tensor(t))
    bcast = lambda a: np.broadcast_to(np.asarray(a), x0.shape)
    np.testing.assert_allclose(bcast(m_mean), _np(t_mean), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(bcast(m_var), _np(t_var), rtol=1e-5, atol=1e-6)

    mm, mv, mlv = mine.q_posterior_mean_variance(
        jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t)
    )
    tm, tv, tlv = theirs.q_posterior_mean_variance(
        torch.tensor(x0), torch.tensor(xt), torch.tensor(t)
    )
    np.testing.assert_allclose(bcast(mm), _np(tm), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(bcast(mv), _np(tv), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(bcast(mlv), _np(tlv), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mean_type", ["eps", "v", "x0"])
@pytest.mark.parametrize("var_type", ["fixed_small", "fixed_large"])
def test_p_mean_variance_parity(mean_type, var_type):
    mine, theirs = _pair(mean_type, var_type)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)
    t = np.array([2, 19])

    def jmodel(xx, tt):
        return jnp.sin(xx * 1.3) + tt.astype(xx.dtype).reshape(-1, 1, 1, 1) * 0.01

    def tmodel(xx, tt):
        return torch.sin(xx * 1.3) + tt.float().reshape(-1, 1, 1, 1) * 0.01

    m = mine.p_mean_variance(jmodel, jnp.asarray(x), jnp.asarray(t), clip_denoised=True)
    th = theirs.p_mean_variance(
        tmodel, torch.tensor(x), torch.tensor(t), clip_denoised=True
    )
    for key in ("mean", "variance", "log_variance", "pred_xstart"):
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(m[key]), x.shape), _np(th[key]),
            rtol=1e-5, atol=1e-5, err_msg=key,
        )


def test_p_mean_variance_learned_range_parity():
    # learned-variance split: reference splits dim=1, we split axis=-1 —
    # use [B, C] tensors so both split the same axis.
    mine, theirs = _pair("v", "learned_range")
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 6)).astype(np.float32)
    t = np.array([0, 7, 19])

    def jmodel(xx, tt):
        return jnp.concatenate([jnp.sin(xx * 1.3), jnp.tanh(xx)], axis=-1)

    def tmodel(xx, tt):
        return torch.cat([torch.sin(xx * 1.3), torch.tanh(xx)], dim=-1)

    m = mine.p_mean_variance(jmodel, jnp.asarray(x), jnp.asarray(t))
    th = theirs.p_mean_variance(tmodel, torch.tensor(x), torch.tensor(t))
    for key in ("mean", "variance", "log_variance", "pred_xstart"):
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(m[key]), x.shape), _np(th[key]),
            rtol=1e-5, atol=1e-5, err_msg=key,
        )


@pytest.mark.parametrize("mean_type,min_snr", [("eps", False), ("v", True), ("x0", False)])
def test_training_losses_parity(mean_type, min_snr):
    mine, theirs = _pair(mean_type, "fixed_small", min_snr=min_snr)
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)
    noise = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([0, 15])

    def jmodel(xx, tt):
        return jnp.sin(xx) * 0.5

    def tmodel(xx, tt):
        return torch.sin(xx) * 0.5

    m_terms, m_aux = mine.training_losses(
        jmodel, jnp.asarray(x0), jnp.asarray(t), rng=jax.random.PRNGKey(0),
        noise=jnp.asarray(noise),
    )
    t_terms, t_aux = theirs.training_losses(
        tmodel, torch.tensor(x0), torch.tensor(t), noise=torch.tensor(noise)
    )
    np.testing.assert_allclose(
        np.asarray(m_terms["loss"]), _np(t_terms["loss"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m_aux["x_t"]), _np(t_aux["x_t"]), rtol=1e-5, atol=1e-6
    )


def test_vb_terms_parity():
    # covers normal_kl + discretized gaussian log-likelihood (t=0 branch)
    mine, theirs = _pair("eps", "fixed_small")
    rng = np.random.default_rng(4)
    x0 = np.clip(rng.normal(size=(3, 4)) * 0.5, -1, 1).astype(np.float32)
    xt = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([0, 5, 19])

    def jmodel(xx, tt):
        return jnp.sin(xx)

    def tmodel(xx, tt):
        return torch.sin(xx)

    m = mine._vb_terms(jmodel, jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t))
    th = theirs._vb_terms_bpd(
        tmodel, torch.tensor(x0), torch.tensor(xt), torch.tensor(t),
        clip_denoised=True,
    )
    np.testing.assert_allclose(
        np.asarray(m["output"]), _np(th["output"]), rtol=1e-4, atol=1e-5
    )


# ----------------------------------------------------------------- embedders


def test_timestep_embedding_parity():
    ref_dit = ref_loader.load_ref("model.dit")
    from gvfdiffusion_tpu.nn.embedders import timestep_embedding

    t = np.array([0.0, 1.0, 3.7, 999.0], dtype=np.float32)
    mine = np.asarray(timestep_embedding(jnp.asarray(t), 64))
    theirs = _np(ref_dit.TimestepEmbedder.timestep_embedding(torch.tensor(t), 64))
    np.testing.assert_allclose(mine, theirs, rtol=1e-5, atol=1e-6)


def test_absolute_position_embedder_parity():
    ref_dit = ref_loader.load_ref("model.dit")
    from gvfdiffusion_tpu.nn.embedders import AbsolutePositionEmbedder

    rng = np.random.default_rng(5)
    pos = rng.normal(size=(2, 7, 3)).astype(np.float32) * 4.0
    theirs = _np(ref_dit.AbsolutePositionEmbedder(48)(torch.tensor(pos)))
    mod = AbsolutePositionEmbedder(48)
    mine = np.asarray(mod.apply({"params": {}}, jnp.asarray(pos)))
    np.testing.assert_allclose(mine, theirs, rtol=1e-5, atol=1e-5)


# ----------------------------------------------------------------------- DiT


@pytest.mark.parametrize("pe_mode", ["ape", "learnable"])
def test_dit_forward_parity(pe_mode):
    ref_dit = ref_loader.load_ref("model.dit")
    from gvfdiffusion_tpu.models.dit import DiT

    B, T, N, Cin, L, Ns = 2, 3, 8, 6, 5, 4
    cfg = dict(
        resolution=N, in_channels=Cin, model_channels=64,
        static_cond_channels=7, image_cond_channels=9, out_channels=Cin,
        num_blocks=2, num_heads=4, pe_mode=pe_mode, share_mod=False,
        qk_rms_norm=True, no_temporal_attn=False,
    )
    theirs = ref_dit.DiT(
        num_head_channels=cfg["model_channels"] // cfg["num_heads"], **cfg
    ).eval()
    _randomize(theirs, seed=10)

    params = wc.convert_dit(
        theirs.state_dict(), num_blocks=2, qk_rms_norm=True,
        no_temporal_attn=False, share_mod=False,
    )
    mine = DiT(**cfg)

    rng = np.random.default_rng(6)
    x = rng.normal(size=(B, T, N, Cin)).astype(np.float32)
    t = np.array([3, 17])
    cond = rng.normal(size=(B, T, L, 9)).astype(np.float32)
    static = rng.normal(size=(B, Ns, 7)).astype(np.float32)
    xyz = rng.normal(size=(B, N, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = theirs(
            torch.tensor(x), torch.tensor(t), torch.tensor(cond),
            torch.tensor(static),
            torch.tensor(xyz) if pe_mode == "ape" else None,
        )
    my_out = mine.apply(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(cond), jnp.asarray(static),
        jnp.asarray(xyz) if pe_mode == "ape" else None,
    )
    np.testing.assert_allclose(np.asarray(my_out), _np(ref_out), rtol=2e-4, atol=2e-4)


def test_dit_kv_cache_matches_direct():
    """The KV-cached path (our addition) must equal the direct path with the
    same converted reference weights."""
    ref_dit = ref_loader.load_ref("model.dit")
    from gvfdiffusion_tpu.models.dit import DiT

    B, T, N, Cin, L, Ns = 1, 2, 4, 6, 3, 4
    cfg = dict(
        resolution=N, in_channels=Cin, model_channels=32,
        static_cond_channels=7, image_cond_channels=9, out_channels=Cin,
        num_blocks=2, num_heads=4, pe_mode="ape", share_mod=False,
        qk_rms_norm=True, no_temporal_attn=False,
    )
    theirs = ref_dit.DiT(num_head_channels=8, **cfg).eval()
    _randomize(theirs, seed=11)
    params = jax.tree.map(
        jnp.asarray,
        wc.convert_dit(theirs.state_dict(), num_blocks=2, qk_rms_norm=True,
                       no_temporal_attn=False, share_mod=False),
    )
    mine = DiT(**cfg)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(B, T, N, Cin)).astype(np.float32))
    t = jnp.asarray(np.array([5]))
    cond = jnp.asarray(rng.normal(size=(B, T, L, 9)).astype(np.float32))
    static = jnp.asarray(rng.normal(size=(B, Ns, 7)).astype(np.float32))
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    direct = mine.apply(params, x, t, cond, static, xyz)
    kv = mine.apply(params, x, t, cond, static, xyz, kv_only=True)
    cached = mine.apply(params, x, t, cond, static, xyz, cross_kv=kv)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(cached), atol=1e-5)


# ----------------------------------------------------------------- motion VAE


def _small_vae_pair():
    ref_ae = ref_loader.load_ref("model.autoencoder")
    from gvfdiffusion_tpu.models.motion_vae import MotionVAE

    kw = dict(depth=2, dim=24, queries_dim=24, input_dim=3, gs_dim=14,
              output_dim=14, num_inputs=32, num_latents=8, latent_dim=4,
              heads=4, knn_k=4, beta=7.0)
    theirs = ref_ae.GSKLTemporalVariationalAutoEncoder(
        num_timesteps=3, dim_head=-1, chunk_size=8192, **kw
    ).eval()
    _randomize(theirs, seed=20)
    params = jax.tree.map(jnp.asarray, wc.convert_motion_vae(theirs.state_dict(), depth=2))
    mine = MotionVAE(**kw)
    return mine, theirs, params


def test_motion_vae_encode_parity():
    from gvfdiffusion_tpu.models.motion_vae import pad_static_gs

    mine, theirs, params = _small_vae_pair()
    rng = np.random.default_rng(8)
    B, T, N, G = 2, 3, 32, 16
    static_pc = rng.normal(size=(B, N, 3)).astype(np.float32)
    delta_pc = (rng.normal(size=(B, T, N, 3)) * 0.1).astype(np.float32)
    gs_list = [rng.normal(size=(G, 14)).astype(np.float32) for _ in range(B)]

    with torch.no_grad():
        t_kl, _, posterior, t_sampled = theirs.encode(
            torch.tensor(static_pc), torch.tensor(delta_pc),
            [torch.tensor(g) for g in gs_list],
        )

    padded, valid = pad_static_gs(gs_list)
    m_kl, m_mean, m_logvar, m_sampled = mine.apply(
        params, jnp.asarray(static_pc), jnp.asarray(delta_pc), padded, valid,
        method=mine.encode,
    )
    # FPS anchor selection must agree exactly (same greedy algorithm)
    np.testing.assert_allclose(np.asarray(m_sampled), _np(t_sampled), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_mean), _np(posterior.mean), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_logvar), _np(posterior.logvar), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_kl), _np(t_kl), rtol=1e-4, atol=1e-5)


def test_motion_vae_decode_parity():
    from gvfdiffusion_tpu.models.motion_vae import pad_static_gs

    mine, theirs, params = _small_vae_pair()
    rng = np.random.default_rng(9)
    B, T, L, G = 2, 3, 8, 16
    z = rng.normal(size=(B * T, L, 4)).astype(np.float32)
    gs_list = [rng.normal(size=(G, 14)).astype(np.float32) for _ in range(B)]
    padded, _ = pad_static_gs(gs_list)

    with torch.no_grad():
        t_out = theirs.decode(
            torch.tensor(z), torch.stack([torch.tensor(g) for g in gs_list])
        )
    m_out = mine.apply(params, jnp.asarray(z), padded, T, method=mine.decode)
    np.testing.assert_allclose(
        np.asarray(m_out), _np(t_out).reshape(B, T, G, -1), rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------- DPM-Solver


def _dpm_mods():
    ref_dpm = ref_loader.load_ref("model.dpmsolver")
    from gvfdiffusion_tpu.diffusion import dpm_solver as my_dpm

    return my_dpm, ref_dpm


@pytest.mark.parametrize("schedule", ["linear", "cosine"])
def test_noise_schedule_parity(schedule):
    my_dpm, ref_dpm = _dpm_mods()
    betas = my_gd.get_named_beta_schedule(schedule, 200)
    ns_m = my_dpm.NoiseScheduleVP.from_betas(betas)
    ns_t = ref_dpm.NoiseScheduleVP("discrete", betas=torch.tensor(betas, dtype=torch.float64))
    assert ns_m.total_N == ns_t.total_N  # cosine: lambda-clipped length
    t = np.linspace(1.0 / ns_t.total_N, 1.0, 37).astype(np.float32)
    for name in ("marginal_alpha", "marginal_std", "marginal_lambda"):
        mine = np.asarray(getattr(ns_m, name)(jnp.asarray(t)))
        theirs = _np(getattr(ns_t, name)(torch.tensor(t)))
        np.testing.assert_allclose(mine, theirs, rtol=1e-4, atol=1e-5, err_msg=name)
    lam = np.asarray(ns_m.marginal_lambda(jnp.asarray(t)))
    np.testing.assert_allclose(
        np.asarray(ns_m.inverse_lambda(jnp.asarray(lam))),
        _np(ns_t.inverse_lambda(torch.tensor(lam))),
        rtol=1e-4, atol=1e-5,
    )


def _toy_models():
    def jmodel(x, t_input, **kw):
        return jnp.sin(x * 0.7) * 0.3 + jnp.cos(
            t_input.astype(x.dtype) * 0.01
        ).reshape(-1, 1) * 0.05

    def tmodel(x, t_input, **kw):
        if t_input.ndim == 0:
            t_input = t_input[None].expand(x.shape[0])
        return torch.sin(x * 0.7) * 0.3 + torch.cos(
            t_input.float() * 0.01
        ).reshape(-1, 1) * 0.05

    return jmodel, tmodel


@pytest.mark.parametrize("steps,order,model_type", [(8, 2, "v"), (12, 2, "noise"), (12, 3, "v")])
def test_dpm_multistep_sample_parity(steps, order, model_type):
    my_dpm, ref_dpm = _dpm_mods()
    betas = my_gd.get_named_beta_schedule("cosine", 100)
    ns_m = my_dpm.NoiseScheduleVP.from_betas(betas)
    ns_t = ref_dpm.NoiseScheduleVP("discrete", betas=torch.tensor(betas, dtype=torch.float64))
    jmodel, tmodel = _toy_models()

    fn_m = my_dpm.model_wrapper(jmodel, ns_m, model_type=model_type)
    fn_t = ref_dpm.model_wrapper(tmodel, ns_t, model_type=model_type)
    solver_m = my_dpm.DPMSolver(fn_m, ns_m, algorithm_type="dpmsolver++")
    solver_t = ref_dpm.DPM_Solver(fn_t, ns_t, algorithm_type="dpmsolver++")

    x = np.random.default_rng(11).normal(size=(2, 6)).astype(np.float32)
    out_m = solver_m.sample(jnp.asarray(x), steps=steps, order=order, method="multistep")
    out_t = solver_t.sample(torch.tensor(x), steps=steps, order=order, method="multistep")
    np.testing.assert_allclose(np.asarray(out_m), _np(out_t), rtol=2e-4, atol=2e-4)


def test_dpm_dualscale_cfg_parity():
    """Dual-scale (CAT4D) classifier-free guidance: 3-way batch + static_latent
    zeroing (reference model/dpmsolver.py:330-347)."""
    my_dpm, ref_dpm = _dpm_mods()
    betas = my_gd.get_named_beta_schedule("cosine", 100)
    ns_m = my_dpm.NoiseScheduleVP.from_betas(betas)
    ns_t = ref_dpm.NoiseScheduleVP("discrete", betas=torch.tensor(betas, dtype=torch.float64))

    def jmodel(x, t_input, cond_images=None, static_latent=None):
        return (jnp.sin(x) * 0.2 + cond_images * 0.1
                + static_latent * 0.05
                + t_input.astype(x.dtype).reshape(-1, 1) * 1e-4)

    def tmodel(x, t_input, cond_images=None, static_latent=None):
        if t_input.ndim == 0:
            t_input = t_input[None].expand(x.shape[0])
        return (torch.sin(x) * 0.2 + cond_images * 0.1
                + static_latent * 0.05
                + t_input.float().reshape(-1, 1) * 1e-4)

    rng = np.random.default_rng(12)
    B, C = 2, 6
    cond = rng.normal(size=(B, C)).astype(np.float32)
    uncond = rng.normal(size=(B, C)).astype(np.float32)
    static = rng.normal(size=(B, C)).astype(np.float32)

    fn_m = my_dpm.model_wrapper(
        jmodel, ns_m, model_type="v", guidance_type="classifier-free",
        condition={"cond_images": jnp.asarray(cond), "static_latent": jnp.asarray(static)},
        unconditional_condition={"cond_images": jnp.asarray(uncond),
                                 "static_latent": jnp.asarray(static)},
        guidance_scale=7.5, guidance_scale2=3.0,
    )
    fn_t = ref_dpm.model_wrapper(
        tmodel, ns_t, model_type="v", guidance_type="classifier-free",
        condition={"cond_images": torch.tensor(cond), "static_latent": torch.tensor(static)},
        unconditional_condition={"cond_images": torch.tensor(uncond),
                                 "static_latent": torch.tensor(static)},
        guidance_scale=7.5, guidance_scale2=3.0,
    )
    solver_m = my_dpm.DPMSolver(fn_m, ns_m)
    solver_t = ref_dpm.DPM_Solver(fn_t, ns_t, algorithm_type="dpmsolver++")
    x = rng.normal(size=(B, C)).astype(np.float32)
    out_m = solver_m.sample(jnp.asarray(x), steps=10, order=2, method="multistep")
    out_t = solver_t.sample(torch.tensor(x), steps=10, order=2, method="multistep")
    np.testing.assert_allclose(np.asarray(out_m), _np(out_t), rtol=5e-4, atol=5e-4)


def test_dpm_singlestep_parity():
    my_dpm, ref_dpm = _dpm_mods()
    betas = my_gd.get_named_beta_schedule("linear", 100)
    ns_m = my_dpm.NoiseScheduleVP.from_betas(betas)
    ns_t = ref_dpm.NoiseScheduleVP("discrete", betas=torch.tensor(betas, dtype=torch.float64))
    jmodel, tmodel = _toy_models()
    # v-parameterization keeps the data prediction bounded: with model_type=
    # "noise" the x0 = (x - sigma*eps)/alpha divide at t=T amplifies the
    # ~2e-6 per-update float drift (verified) by ~450x, swamping tolerance.
    fn_m = my_dpm.model_wrapper(jmodel, ns_m, model_type="v")
    fn_t = ref_dpm.model_wrapper(tmodel, ns_t, model_type="v")
    solver_m = my_dpm.DPMSolver(fn_m, ns_m)
    solver_t = ref_dpm.DPM_Solver(fn_t, ns_t, algorithm_type="dpmsolver++")
    x = np.random.default_rng(13).normal(size=(2, 6)).astype(np.float32)
    out_m = solver_m.sample(jnp.asarray(x), steps=9, order=2, method="singlestep")
    out_t = solver_t.sample(torch.tensor(x), steps=9, order=2, method="singlestep")
    np.testing.assert_allclose(np.asarray(out_m), _np(out_t), rtol=2e-4, atol=2e-4)


def test_prior_bpd_parity():
    mine, theirs = _pair("eps", "fixed_small")
    x0 = np.random.default_rng(14).normal(size=(3, 6)).astype(np.float32) * 0.5
    out = mine.calc_bpd_loop(
        lambda x, t, **kw: jnp.sin(x), jnp.asarray(x0), jax.random.PRNGKey(0)
    )
    ref_prior = theirs._prior_bpd(torch.tensor(x0))
    np.testing.assert_allclose(
        np.asarray(out["prior_bpd"]), _np(ref_prior), rtol=1e-4, atol=1e-5
    )


def test_lpips_converter_parity(tmp_path):
    """Run the reference's vendored LPIPS (utils/lpips) with random VGG16+lin
    weights, convert via ops/lpips.convert_torch_lpips, and assert the flax
    LPIPS agrees — proving the weights path end to end."""
    ref_loader.install_stubs()
    ref_loader.install_lpips_hub_stub(seed=33)
    import importlib

    ref_lpips_mod = importlib.import_module("utils.lpips.lpips")
    theirs = ref_lpips_mod.LPIPS(net_type="vgg").eval()
    _randomize(theirs.net, seed=34, scale=0.1)

    from gvfdiffusion_tpu.ops.lpips import convert_torch_lpips, load_lpips

    vgg_state = {
        f"features.{k}": v for k, v in theirs.net.layers.state_dict().items()
    }
    lin_state = {
        f"lin{i}.model.1.weight": theirs.lin[i][1].weight for i in range(5)
    }
    flat = convert_torch_lpips(vgg_state, lin_state)
    path = str(tmp_path / "lpips.npz")
    np.savez(path, **flat)
    fn = load_lpips(path)
    assert fn is not None

    rng = np.random.default_rng(35)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    mine = np.asarray(fn(jnp.asarray(x), jnp.asarray(y)))  # per-sample [B]

    with torch.no_grad():
        # reference expects [-1,1] NCHW and returns sum-over-batch/B
        tx = torch.tensor(x * 2 - 1).permute(0, 3, 1, 2)
        ty = torch.tensor(y * 2 - 1).permute(0, 3, 1, 2)
        ref = float(theirs(tx, ty))
    np.testing.assert_allclose(mine.mean(), ref, rtol=1e-3, atol=1e-5)


# ----------------------------------------------------------------- static VAE


@pytest.mark.parametrize("old_impl", [False, True])
def test_static_vae_parity(old_impl):
    """Reference SparseTransformerVAE (swin sparse attention, run on CPU via
    the pure-torch sparse-stack stubs) vs the converted flax model —
    encode posterior and full decode, compared per voxel coordinate.

    old_impl covers both fused-qkv layouts: the class default (H, 3, Ch)
    "old" layout and the shipped configs' (3, H, Ch) layout
    (configs/diffusion.yml:57 use_old_attn_impl: false)."""
    stv = ref_loader.load_ref("model.sparse_voxel_diffusion.sparse_transformer_vae")
    import sparse as sp

    from gvfdiffusion_tpu.models.static_vae import SparseTransformerVAE
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    kw = dict(resolution=16, in_channels=8, model_channels=32, out_channels=10,
              latent_channels=4, num_blocks=2, window_size=4, num_heads=4)
    theirs = stv.SparseTransformerVAE(
        num_head_channels=8, attn_mode="swin", norm_output=True,
        use_old_attn_impl=old_impl, **kw
    ).eval()
    _randomize(theirs, seed=40, scale=0.1)
    params = jax.tree.map(
        jnp.asarray,
        wc.convert_static_vae(theirs.state_dict(), num_blocks=2, num_heads=4,
                              old_qkv_layout=old_impl)
    )
    mine = SparseTransformerVAE(attn_mode="swin", **kw)

    rng = np.random.default_rng(41)
    n = 6
    lin = rng.choice(16**3, size=n, replace=False)
    coords = np.stack([lin // 256, (lin // 16) % 16, lin % 16], -1).astype(np.int32)
    feats = rng.normal(size=(n, 8)).astype(np.float32)

    tcoords = torch.tensor(
        np.concatenate([np.zeros((n, 1), np.int32), coords], 1)
    )
    tx = sp.SparseTensor(
        feats=torch.tensor(feats), coords=tcoords, shape=torch.Size([1, 8])
    )
    with torch.no_grad():
        t_z, t_mean, t_logvar = theirs.encode(tx, sample_posterior=False,
                                              return_raw=True)
        t_out = theirs.decode(t_z)

    x = from_lists([coords], [feats], resolution=16, capacity=8)
    m_z, m_mean, m_logvar = mine.apply(
        params, x, None, False, method=mine.encode
    )
    m_out = mine.apply(params, m_z, method=mine.decode)

    # compare per coordinate (the reference tensor may reorder rows)
    t_coords_out = np.asarray(t_z.coords[:, 1:])
    t_map = {tuple(c): i for i, c in enumerate(t_coords_out)}
    m_coords = np.asarray(x.coords[0])
    m_valid = np.asarray(x.valid[0])
    for li in range(x.capacity):
        if not m_valid[li]:
            continue
        ti = t_map[tuple(m_coords[li])]
        np.testing.assert_allclose(
            np.asarray(m_mean[0, li]), _np(t_mean[ti]), rtol=2e-4, atol=2e-4,
            err_msg=f"mean voxel {li}",
        )
        np.testing.assert_allclose(
            np.asarray(m_logvar[0, li]), _np(t_logvar[ti]), rtol=2e-4, atol=2e-4,
            err_msg=f"logvar voxel {li}",
        )
        np.testing.assert_allclose(
            np.asarray(m_out.feats[0, li]), _np(t_out.feats[ti]),
            rtol=5e-4, atol=5e-4, err_msg=f"decode voxel {li}",
        )


def test_dinov2_converter_parity():
    """convert_dinov2 vs a minimal torch ViT implementing the DINOv2 block
    math (pre-norm attn/MLP with LayerScale, registers, fused qkv in the
    torch-hub key layout). Same random weights -> same prenorm tokens."""
    import torch.nn as tnn

    dim, heads, depth, patch, img, regs = 32, 4, 2, 14, 28, 2

    class TAttn(tnn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = tnn.Linear(dim, dim * 3)
            self.proj = tnn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, heads, C // heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            att = (q @ k.transpose(-2, -1)) / (C // heads) ** 0.5
            out = att.softmax(-1) @ v
            return self.proj(out.transpose(1, 2).reshape(B, N, C))

    class TLS(tnn.Module):
        def __init__(self):
            super().__init__()
            self.gamma = tnn.Parameter(torch.ones(dim))

        def forward(self, x):
            return x * self.gamma

    class TMlp(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(dim, dim * 4)
            self.fc2 = tnn.Linear(dim * 4, dim)

        def forward(self, x):
            return self.fc2(tnn.functional.gelu(self.fc1(x)))

    class TBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
            self.attn = TAttn()
            self.ls1 = TLS()
            self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
            self.mlp = TMlp()
            self.ls2 = TLS()

        def forward(self, x):
            x = x + self.ls1(self.attn(self.norm1(x)))
            return x + self.ls2(self.mlp(self.norm2(x)))

    class TPatch(tnn.Module):
        def __init__(self):
            super().__init__()
            self.proj = tnn.Conv2d(3, dim, patch, stride=patch)

    class TViT(tnn.Module):
        def __init__(self):
            super().__init__()
            n = (img // patch) ** 2
            self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
            self.pos_embed = tnn.Parameter(torch.zeros(1, 1 + n, dim))
            self.register_tokens = tnn.Parameter(torch.zeros(1, regs, dim))
            self.patch_embed = TPatch()
            self.blocks = tnn.ModuleList([TBlock() for _ in range(depth)])
            self.norm = tnn.LayerNorm(dim, eps=1e-6)

        def forward(self, x):
            B = x.shape[0]
            h = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            h = h + self.pos_embed[:, 1:]
            cls = (self.cls_token + self.pos_embed[:, :1]).expand(B, -1, -1)
            reg = self.register_tokens.expand(B, -1, -1)
            h = torch.cat([cls, reg, h], dim=1)
            for b in self.blocks:
                h = b(h)
            return h  # x_prenorm

    tm = _randomize(TViT(), seed=3)
    x = torch.randn(2, 3, img, img, generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        expect = _np(tm(x))

    from gvfdiffusion_tpu.models.dinov2 import DinoV2

    model = DinoV2(img_size=img, patch_size=patch, embed_dim=dim, depth=depth,
                   num_heads=heads, num_register_tokens=regs)
    params = wc.convert_dinov2(
        {k: _np(v) for k, v in tm.state_dict().items()}, depth=depth
    )
    prenorm, _ = model.apply(params, jnp.asarray(_np(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(prenorm), expect, atol=2e-5)


def test_clip_visual_converter_parity():
    """convert_clip_visual vs a torch replica of the CLIP visual tower
    (nn.MultiheadAttention packed qkv, QuickGELU, pre-LN). Same weights ->
    same embeddings."""
    import torch.nn as tnn

    width, heads, depth, patch, img, embed = 32, 4, 2, 8, 16, 16

    class TBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = tnn.LayerNorm(width, eps=1e-5)
            self.attn = tnn.MultiheadAttention(width, heads)
            self.ln_2 = tnn.LayerNorm(width, eps=1e-5)
            self.mlp = tnn.Sequential()
            self.mlp.add_module("c_fc", tnn.Linear(width, width * 4))
            self.mlp.add_module("c_proj", tnn.Linear(width * 4, width))

        def forward(self, x):  # [L, B, C]
            h = self.ln_1(x)
            x = x + self.attn(h, h, h, need_weights=False)[0]
            h = self.mlp.c_fc(self.ln_2(x))
            h = h * torch.sigmoid(1.702 * h)  # QuickGELU
            return x + self.mlp.c_proj(h)

    class TVisual(tnn.Module):
        def __init__(self):
            super().__init__()
            n = (img // patch) ** 2
            self.conv1 = tnn.Conv2d(3, width, patch, stride=patch, bias=False)
            self.class_embedding = tnn.Parameter(torch.zeros(width))
            self.positional_embedding = tnn.Parameter(torch.zeros(1 + n, width))
            self.ln_pre = tnn.LayerNorm(width, eps=1e-5)
            self.transformer = tnn.Module()
            self.transformer.resblocks = tnn.ModuleList(
                [TBlock() for _ in range(depth)])
            self.ln_post = tnn.LayerNorm(width, eps=1e-5)
            self.proj = tnn.Parameter(torch.zeros(width, embed))

        def forward(self, x):  # [B, 3, H, W] CLIP-normalized
            h = self.conv1(x).flatten(2).transpose(1, 2)  # [B, N, C]
            cls = self.class_embedding[None, None].expand(h.shape[0], 1, -1)
            h = torch.cat([cls, h], 1) + self.positional_embedding[None]
            h = self.ln_pre(h).transpose(0, 1)  # [L, B, C]
            for blk in self.transformer.resblocks:
                h = blk(h)
            h = self.ln_post(h.transpose(0, 1)[:, 0])
            return h @ self.proj

    tm = _randomize(TVisual(), seed=7)
    x01 = torch.rand(2, 3, img, img, generator=torch.Generator().manual_seed(4))
    from gvfdiffusion_tpu.models.clip import CLIP_MEAN, CLIP_STD, CLIPImageEncoder

    mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)
    with torch.no_grad():
        expect = _np(tm((x01 - mean) / std))

    model = CLIPImageEncoder(image_size=img, patch_size=patch, width=width,
                             depth=depth, heads=heads, embed_dim=embed)
    params = wc.convert_clip_visual(
        {k: _np(v) for k, v in tm.state_dict().items()}, depth=depth)
    got = model.apply(params, jnp.asarray(_np(x01).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), expect, atol=3e-5)


def test_trellis_ss_flow_parity():
    """TRELLIS SparseStructureFlowModel (torch, loaded from /root/reference
    with package stubs) vs our flax ss_flow: same weights -> same velocity
    field, including the patchify channel-order permutation."""
    ssf = ref_loader.load_trellis("trellis.models.sparse_structure_flow")

    kw = dict(resolution=8, in_channels=4, model_channels=64,
              cond_channels=32, out_channels=4, num_blocks=2, num_heads=4,
              patch_size=2, qk_rms_norm=True)
    tm = _randomize(ssf.SparseStructureFlowModel(**kw), seed=5)
    x = torch.randn(2, 4, 8, 8, 8, generator=torch.Generator().manual_seed(1))
    t = torch.tensor([100.0, 500.0])
    cond = torch.randn(2, 6, 32, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        expect = _np(tm(x, t, cond))  # [B, C, R, R, R]

    from gvfdiffusion_tpu.models.trellis.ss_flow import SparseStructureFlowModel

    model = SparseStructureFlowModel(**kw)
    params = wc.convert_ss_flow(
        {k: _np(v) for k, v in tm.state_dict().items()},
        num_blocks=2, in_channels=4, out_channels=4, patch_size=2,
        qk_rms_norm=True,
    )
    got = model.apply(
        params, jnp.asarray(_np(x).transpose(0, 2, 3, 4, 1)),
        jnp.asarray(_np(t)), jnp.asarray(_np(cond)),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), expect, atol=3e-5
    )


def test_trellis_ss_decoder_parity():
    """TRELLIS SparseStructureDecoder (torch) vs flax: same weights -> same
    occupancy logits, incl. the pixel-shuffle channel permutation."""
    ssv = ref_loader.load_trellis("trellis.models.sparse_structure_vae")

    channels = (16, 8)
    tm = _randomize(
        ssv.SparseStructureDecoder(
            out_channels=1, latent_channels=4, num_res_blocks=1,
            channels=list(channels), num_res_blocks_middle=1,
            norm_type="layer",
        ),
        seed=6,
    )
    z = torch.randn(2, 4, 4, 4, 4, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        expect = _np(tm(z))

    from gvfdiffusion_tpu.models.trellis.ss_vae import SparseStructureDecoder

    model = SparseStructureDecoder(
        out_channels=1, latent_channels=4, num_res_blocks=1,
        channels=channels, num_res_blocks_middle=1, norm_type="layer",
    )
    params = wc.convert_ss_decoder(
        {k: _np(v) for k, v in tm.state_dict().items()},
        channels=channels, num_res_blocks=1, num_res_blocks_middle=1,
    )
    got = model.apply(params, jnp.asarray(_np(z).transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), expect, atol=3e-5
    )


# ------------------------------------------------------------- TRELLIS SLat


def _slat_sparse_input(n=10, res=16, c=4, seed=7):
    """Random sparse voxels as (coords [n,3], feats [n,c]) + torch/jax forms."""
    rng = np.random.default_rng(seed)
    lin = np.sort(rng.choice(res**3, size=n, replace=False))
    coords = np.stack(
        [lin // (res * res), (lin // res) % res, lin % res], -1
    ).astype(np.int32)
    feats = rng.normal(size=(n, c)).astype(np.float32) * 0.5
    return coords, feats


def _trellis_sparse(coords, feats):
    sp_mod = ref_loader.load_trellis("trellis.modules.sparse")
    n = coords.shape[0]
    tcoords = torch.tensor(
        np.concatenate([np.zeros((n, 1), np.int32), coords], 1)
    )
    return sp_mod.SparseTensor(feats=torch.tensor(feats), coords=tcoords)


def _match_by_coords(t_coords, t_vals, m_coords, m_valid, m_vals, label,
                     rtol=2e-4, atol=2e-4):
    """Compare values voxel-by-voxel via coordinate keys (the two frameworks
    order sparse rows differently)."""
    t_map = {tuple(c): i for i, c in enumerate(np.asarray(t_coords))}
    for li in range(m_coords.shape[0]):
        if not m_valid[li]:
            continue
        ti = t_map[tuple(m_coords[li])]
        np.testing.assert_allclose(
            np.asarray(m_vals[li]), np.asarray(t_vals[ti]), rtol=rtol,
            atol=atol, err_msg=f"{label} voxel {li}",
        )


def test_trellis_slat_flow_parity():
    """TRELLIS SLatFlowModel (torch on CPU: computing SubMConv3d stub +
    sdpa flash stub) vs flax slat_flow: same random weights -> same velocity
    field through input res-blocks, downsample, transformer torso, upsample
    with skips, and the out layer. Reference
    trellis/models/structured_latent_flow.py:234."""
    slf = ref_loader.load_trellis("trellis.models.structured_latent_flow")

    kw = dict(resolution=16, in_channels=4, model_channels=32,
              cond_channels=16, out_channels=4, num_blocks=2, num_heads=4,
              patch_size=2, num_io_res_blocks=2, io_block_channels=[8],
              # qk_rms_norm_cross stays False: the reference's cross+RMS
              # path crashes on dense context (modules.py:133 unbinds dim 1
              # of a [B,L,2,H,C] tensor), so released image-cond models
              # cannot enable it
              qk_rms_norm=True, qk_rms_norm_cross=False)
    tm = _randomize(slf.SLatFlowModel(**kw), seed=11, scale=0.1).eval()

    coords, feats = _slat_sparse_input(n=10, res=16, c=4)
    tx = _trellis_sparse(coords, feats)
    t = torch.tensor([500.0])
    cond = torch.randn(1, 5, 16, generator=torch.Generator().manual_seed(12))
    with torch.no_grad():
        t_out = tm(tx, t, cond)

    from gvfdiffusion_tpu.models.trellis.slat_flow import SLatFlowModel
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    mine = SLatFlowModel(
        resolution=16, in_channels=4, model_channels=32, cond_channels=16,
        out_channels=4, num_blocks=2, num_heads=4, patch_size=2,
        num_io_res_blocks=2, io_block_channels=(8,), qk_rms_norm=True,
        qk_rms_norm_cross=False,
    )
    params = jax.tree.map(jnp.asarray, wc.convert_slat_flow(
        {k: _np(v) for k, v in tm.state_dict().items()},
        num_blocks=2, io_block_channels=(8,), num_io_res_blocks=2,
        qk_rms_norm=True, qk_rms_norm_cross=False,
    ))
    x = from_lists([coords], [feats], resolution=16, capacity=12)
    m_out = mine.apply(params, x, jnp.asarray([500.0]),
                       jnp.asarray(_np(cond)))

    _match_by_coords(
        np.asarray(t_out.coords[:, 1:]), _np(t_out.feats),
        np.asarray(x.coords[0]), np.asarray(x.valid[0]),
        np.asarray(m_out.feats[0]), "slat_flow velocity",
        rtol=5e-4, atol=5e-4,
    )


def test_trellis_slat_gs_decoder_parity():
    """True-TRELLIS SLatGaussianDecoder (decoder_gs.py:117) vs flax: same
    random weights -> same gaussian attributes per voxel (xyz after the
    Hammersley perturbation + tanh squash, dc/scaling/rotation/opacity with
    the per-attribute lr scaling)."""
    import functools

    dgs = ref_loader.load_trellis(
        "trellis.models.structured_latent_vae.decoder_gs")
    # the reference Gaussian hardcodes device='cuda' (gaussian_model.py:17)
    dgs.Gaussian = functools.partial(dgs.Gaussian, device="cpu")

    rep_cfg = dict(
        num_gaussians=8, voxel_size=1.5, scaling_bias=0.004,
        opacity_bias=0.1, scaling_activation="softplus",
        perturb_offset=True,
        lr={"_xyz": 1.0, "_features_dc": 1.0, "_scaling": 1.0,
            "_rotation": 0.1, "_opacity": 1.0},
        **{"3d_filter_kernel_size": 9e-4},
    )
    tm = _randomize(
        dgs.SLatGaussianDecoder(
            resolution=16, model_channels=32, latent_channels=4,
            num_blocks=2, num_heads=4, attn_mode="swin", window_size=4,
            representation_config=rep_cfg,
        ), seed=21, scale=0.1,
    ).eval()

    coords, feats = _slat_sparse_input(n=8, res=16, c=4, seed=22)
    tx = _trellis_sparse(coords, feats)
    # setup_functions also hardcodes .cuda() on the bias tensors
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        with torch.no_grad():
            t_gs = tm(tx)[0]
    finally:
        torch.Tensor.cuda = orig_cuda

    from gvfdiffusion_tpu.models.sparse_vae import GSConfig
    from gvfdiffusion_tpu.models.trellis.slat_decoders import SLatGaussianDecoder
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    mine = SLatGaussianDecoder(
        resolution=16, model_channels=32, latent_channels=4, num_blocks=2,
        num_heads=4, attn_mode="swin", window_size=4,
        rep_config=GSConfig(num_gaussians=8, voxel_size=1.5,
                            scaling_bias=0.004, opacity_bias=0.1,
                            scaling_activation="softplus",
                            filter_3d_kernel_size=9e-4, lr_rotation=0.1),
    )
    params = jax.tree.map(jnp.asarray, wc.convert_slat_gs_decoder(
        {k: _np(v) for k, v in tm.state_dict().items()}, num_blocks=2,
    ))
    x = from_lists([coords], [feats], resolution=16, capacity=8)
    m_gs, m_valid = mine.apply(params, x)

    # reference rows follow its coord order; ours follow slot order. Both
    # expand each voxel into G consecutive gaussians.
    g = 8
    t_coords = np.asarray(tx.coords[:, 1:])
    m_coords = np.asarray(x.coords[0])
    t_map = {tuple(c): i for i, c in enumerate(t_coords)}
    for li in range(x.capacity):
        if not np.asarray(x.valid[0])[li]:
            continue
        ti = t_map[tuple(m_coords[li])]
        for attr in ["_xyz", "_features_dc", "_scaling", "_rotation",
                     "_opacity"]:
            t_v = _np(getattr(t_gs, attr))[ti * g:(ti + 1) * g]
            m_v = np.asarray(getattr(m_gs, attr))[0, li * g:(li + 1) * g]
            np.testing.assert_allclose(
                m_v, t_v, rtol=3e-4, atol=3e-4,
                err_msg=f"{attr} voxel {li}",
            )


def test_trellis_slat_encoder_parity():
    """TRELLIS SLatEncoder (encoder.py) vs flax: same weights -> same
    posterior mean/logvar per voxel."""
    enc = ref_loader.load_trellis(
        "trellis.models.structured_latent_vae.encoder")

    tm = _randomize(
        enc.SLatEncoder(
            resolution=16, in_channels=6, model_channels=32,
            latent_channels=4, num_blocks=2, num_heads=4, attn_mode="swin",
            window_size=4,
        ), seed=31, scale=0.1,
    ).eval()

    coords, feats = _slat_sparse_input(n=9, res=16, c=6, seed=32)
    tx = _trellis_sparse(coords, feats)
    with torch.no_grad():
        t_z, t_mean, t_logvar = tm(tx, sample_posterior=False,
                                   return_raw=True)

    from gvfdiffusion_tpu.models.trellis.slat_decoders import SLatEncoder
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    mine = SLatEncoder(resolution=16, in_channels=6, model_channels=32,
                       latent_channels=4, num_blocks=2, num_heads=4,
                       attn_mode="swin", window_size=4)
    params = jax.tree.map(jnp.asarray, wc.convert_slat_encoder(
        {k: _np(v) for k, v in tm.state_dict().items()}, num_blocks=2,
    ))
    x = from_lists([coords], [feats], resolution=16, capacity=10)
    _, m_mean, m_logvar = mine.apply(params, x, None, False)

    m_coords = np.asarray(x.coords[0])
    m_valid = np.asarray(x.valid[0])
    _match_by_coords(np.asarray(tx.coords[:, 1:]), _np(t_mean), m_coords,
                     m_valid, np.asarray(m_mean[0]), "slat enc mean")
    _match_by_coords(np.asarray(tx.coords[:, 1:]), _np(t_logvar), m_coords,
                     m_valid, np.asarray(m_logvar[0]), "slat enc logvar")


def test_trellis_slat_mesh_decoder_parity():
    """TRELLIS SLatMeshDecoder (decoder_mesh.py:71) vs flax
    SLatMeshDecoderRef: same random weights -> same 53-channel FlexiCubes
    feature field per subdivided voxel (torso -> two SparseSubdivideBlock3d
    upsamples -> zero-init linear head; here all weights randomized)."""
    dm = ref_loader.load_trellis(
        "trellis.models.structured_latent_vae.decoder_mesh")

    class _FakeS2M:
        # stand-in for SparseFeatures2Mesh: the ctor builds CUDA dense grids
        # (cube2mesh.py:72-75); only feats_channels matters for the network
        def __init__(self, res=64, use_color=False):
            self.res = res
            self.use_color = use_color
            self.feats_channels = 8 + 24 + (48 if use_color else 0) + 21

    orig = dm.SparseFeatures2Mesh
    dm.SparseFeatures2Mesh = _FakeS2M
    try:
        tm = _randomize(
            dm.SLatMeshDecoder(
                resolution=16, model_channels=256, latent_channels=4,
                num_blocks=2, num_heads=4, attn_mode="swin", window_size=4,
                representation_config={"use_color": False},
            ), seed=41, scale=0.05,
        ).eval()
    finally:
        dm.SparseFeatures2Mesh = orig

    coords, feats = _slat_sparse_input(n=6, res=16, c=4, seed=42)
    tx = _trellis_sparse(coords, feats)
    tm.to_representation = lambda h: h  # network output, not CUDA extraction
    with torch.no_grad():
        t_out = tm(tx)

    from gvfdiffusion_tpu.models.trellis.slat_mesh_decoder import (
        SLatMeshDecoderRef,
    )
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    mine = SLatMeshDecoderRef(
        resolution=16, model_channels=256, latent_channels=4, num_blocks=2,
        num_heads=4, attn_mode="swin", window_size=4,
    )
    params = jax.tree.map(jnp.asarray, wc.convert_slat_mesh_decoder(
        {k: _np(v) for k, v in tm.state_dict().items()}, num_blocks=2,
    ))
    x = from_lists([coords], [feats], resolution=16, capacity=6)
    m_out = mine.apply(params, x)

    assert m_out.resolution == 64 and m_out.feats.shape[-1] == 53
    _match_by_coords(
        np.asarray(t_out.coords[:, 1:]), _np(t_out.feats),
        np.asarray(m_out.coords[0]), np.asarray(m_out.valid[0]),
        np.asarray(m_out.feats[0]), "slat mesh feats", rtol=5e-4, atol=5e-4,
    )
