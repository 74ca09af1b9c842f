"""Golden-value tests for diffusion math vs independent numpy formulas
(SURVEY.md §4: the rebuild creates the test pyramid the reference lacks)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvfdiffusion_tpu.diffusion import gaussian_diffusion as gd
from gvfdiffusion_tpu.diffusion import respace


def test_linear_betas_golden():
    betas = gd.get_named_beta_schedule("linear", 1000)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    np.testing.assert_allclose(np.diff(betas), np.diff(betas)[0], rtol=1e-9)
    # scale-invariance in the continuum limit: T=500 doubles the betas
    betas500 = gd.get_named_beta_schedule("linear", 500)
    assert betas500[0] == pytest.approx(2e-4)


def test_cosine_betas_golden():
    betas = gd.get_named_beta_schedule("cosine", 1000)
    # independent formula: alpha_bar(t) = cos((t+0.008)/1.008 * pi/2)^2
    f = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    for i in [0, 1, 499, 998]:
        expect = min(1 - f((i + 1) / 1000) / f(i / 1000), 0.999)
        assert betas[i] == pytest.approx(expect, rel=1e-12)
    assert betas[-1] == pytest.approx(0.999)  # capped


@pytest.mark.parametrize("name", ["linear", "cosine", "cosine_light", "sigmoid"])
def test_schedules_valid(name):
    betas = gd.get_named_beta_schedule(name, 100)
    assert betas.shape == (100,)
    assert (betas > 0).all() and (betas <= 1).all()


def test_posterior_coefficients_golden():
    diff = gd.create_diffusion(schedule="linear", steps=100, mean_type="eps")
    betas = np.asarray(diff.betas, dtype=np.float64)
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    np.testing.assert_allclose(
        np.asarray(diff.posterior_mean_coef1),
        betas * np.sqrt(acp_prev) / (1 - acp),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(diff.posterior_variance),
        betas * (1 - acp_prev) / (1 - acp),
        rtol=1e-5,
    )


def test_eps_v_x0_roundtrips():
    diff = gd.create_diffusion(schedule="cosine", steps=1000, mean_type="v")
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x0 = jax.random.normal(k1, (4, 8, 16))
    eps = jax.random.normal(k2, (4, 8, 16))
    t = jax.random.randint(k3, (4,), 0, 1000)
    x_t = diff.q_sample(x0, t, eps)
    # eps-parameterization inverse
    np.testing.assert_allclose(
        np.asarray(diff.predict_xstart_from_eps(x_t, t, eps)), np.asarray(x0),
        atol=2e-4,
    )
    # v-parameterization inverse
    v = diff.get_v(x0, eps, t)
    np.testing.assert_allclose(
        np.asarray(diff.predict_xstart_from_v(x_t, t, v)), np.asarray(x0), atol=2e-4
    )
    # eps recovery from x0
    np.testing.assert_allclose(
        np.asarray(diff.predict_eps_from_xstart(x_t, t, x0)), np.asarray(eps),
        atol=2e-3,
    )


def test_q_sample_statistics():
    diff = gd.create_diffusion(schedule="linear", steps=100)
    x0 = jnp.ones((1, 1000))
    t = jnp.array([5])
    mean, var, logvar = diff.q_mean_variance(x0, t)
    acp = float(diff.alphas_cumprod[5])
    np.testing.assert_allclose(np.asarray(mean), np.sqrt(acp), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), 1 - acp, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.exp(logvar)), 1 - acp, rtol=1e-5)


def test_respace_alignment():
    # Respaced process must reproduce the original alphas_cumprod at kept steps.
    full = gd.create_diffusion(schedule="cosine", steps=1000)
    sp = respace.spaced_diffusion(
        schedule="cosine", steps=1000, timestep_respacing="ddim50"
    )
    assert sp.num_timesteps == 50
    kept = np.asarray(sp.timestep_map)
    np.testing.assert_allclose(
        np.asarray(sp.alphas_cumprod),
        np.asarray(full.alphas_cumprod)[kept],
        rtol=1e-4,
    )


def test_respace_full_is_identity():
    full = gd.create_diffusion(schedule="linear", steps=100)
    sp = respace.spaced_diffusion(schedule="linear", steps=100, timestep_respacing=[100])
    np.testing.assert_allclose(np.asarray(sp.betas), np.asarray(full.betas), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(sp.timestep_map), np.arange(100))


def test_space_timesteps_sections():
    s = respace.space_timesteps(100, [10, 10, 5])
    assert len(s) == 25
    s = respace.space_timesteps(1000, "ddim25")
    assert len(s) == 25


def test_training_losses_v_prediction():
    diff = gd.create_diffusion(schedule="cosine", steps=1000, mean_type="v", min_snr=True)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 4, 8))
    t = jnp.array([10, 900])

    # a model that predicts the exact v target -> zero loss
    captured = {}

    def oracle(x_t, t_scaled, **kw):
        return captured["v"]

    k1, k2 = jax.random.split(rng)
    noise = jax.random.normal(k1, x0.shape)
    captured["v"] = diff.get_v(x0, noise, t)
    terms, aux = diff.training_losses(oracle, x0, t, k2, noise=noise)
    np.testing.assert_allclose(np.asarray(terms["loss"]), 0.0, atol=1e-10)
    assert aux["x_t"].shape == x0.shape


def test_min_snr_weight_capped():
    diff = gd.create_diffusion(schedule="cosine", steps=1000, mean_type="v", min_snr=True)
    # early timesteps have huge SNR -> weight capped at 5
    alpha = diff.sqrt_alphas_cumprod[0]
    sigma = diff.sqrt_one_minus_alphas_cumprod[0]
    assert float((alpha / sigma) ** 2) > 5.0


def test_ddim_recovers_data_with_oracle_eps():
    # With a model that returns the true eps for a known x0, DDIM (eta=0)
    # starting from the exact x_T trajectory must recover x0.
    diff = respace.spaced_diffusion(
        schedule="linear", steps=1000, timestep_respacing="ddim50", mean_type="eps"
    )
    x0 = jnp.full((1, 16), 0.5)

    def oracle(x_t, t_scaled, **kw):
        # invert q_sample: eps = (x_t - sqrt(acp) x0) / sqrt(1-acp)
        # t_scaled is the ORIGINAL-process timestep; match it back to index
        idx = jnp.argmin(jnp.abs(diff.timestep_map.astype(jnp.float32) - t_scaled[0]))
        acp = diff.alphas_cumprod[idx]
        return (x_t - jnp.sqrt(acp) * x0) / jnp.sqrt(1 - acp)

    rng = jax.random.PRNGKey(3)
    out = diff.ddim_sample_loop(oracle, (1, 16), rng, clip_denoised=True)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-2)


def test_p_sample_loop_runs_and_finite():
    diff = respace.spaced_diffusion(
        schedule="cosine", steps=1000, timestep_respacing="ddim10", mean_type="v"
    )
    model = lambda x, t, **kw: jnp.zeros_like(x)
    out = diff.p_sample_loop(model, (2, 8), jax.random.PRNGKey(0))
    assert out.shape == (2, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_learned_range_variance_split():
    diff = gd.create_diffusion(
        schedule="linear", steps=100, mean_type="eps", var_type="learned_range"
    )
    model = lambda x, t, **kw: jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)
    x = jnp.ones((2, 8))
    out = diff.p_mean_variance(model, x, jnp.array([5, 50]), clip_denoised=True)
    assert out["mean"].shape == (2, 8)
    # frac=0.5 -> log var halfway between min and max
    lo = np.asarray(diff.posterior_log_variance_clipped)[5]
    hi = np.log(np.asarray(diff.betas))[5]
    np.testing.assert_allclose(
        np.asarray(out["log_variance"])[0, 0], (lo + hi) / 2, rtol=1e-5
    )


def test_inpainting_mask_keeps_known_region():
    diff = gd.create_diffusion(schedule="cosine", steps=20, mean_type="eps")
    model = lambda x, t, **kw: jnp.zeros_like(x)
    rng = jax.random.PRNGKey(0)
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    mask = jnp.concatenate([jnp.zeros((2, 4)), jnp.ones((2, 4))], axis=1)
    out = diff.p_sample_loop(
        model, (2, 8), rng, noise=noise, inpainting_mask=mask
    )
    # masked-out (known) region never resampled
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(noise[:, :4]))
    assert np.abs(np.asarray(out[:, 4:]) - np.asarray(noise[:, 4:])).max() > 1e-3
    # mask of ones == no mask (same rng stream)
    a = diff.ddim_sample_loop(model, (2, 8), rng, noise=noise,
                              inpainting_mask=jnp.ones((2, 8)))
    b = diff.ddim_sample_loop(model, (2, 8), rng, noise=noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_calc_bpd_loop_shapes_and_finiteness():
    diff = gd.create_diffusion(schedule="cosine", steps=10, mean_type="eps")
    model = lambda x, t, **kw: jnp.tanh(x)
    x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (3, 6)), -1, 1)
    out = diff.calc_bpd_loop(model, x0, jax.random.PRNGKey(3))
    assert out["vb"].shape == (3, 10)
    assert out["xstart_mse"].shape == (3, 10)
    assert out["total_bpd"].shape == (3,)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
    np.testing.assert_allclose(
        np.asarray(out["total_bpd"]),
        np.asarray(out["vb"].sum(1) + out["prior_bpd"]), rtol=1e-5,
    )
