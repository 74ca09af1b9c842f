"""DPM-Solver++ tests: schedule math, oracle-model convergence, CFG algebra."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvfdiffusion_tpu.diffusion import gaussian_diffusion as gd
from gvfdiffusion_tpu.diffusion.dpm_solver import DPMSolver, NoiseScheduleVP, model_wrapper


@pytest.fixture(scope="module")
def ns():
    betas = gd.get_named_beta_schedule("linear", 1000)
    return NoiseScheduleVP.from_betas(betas)


def test_schedule_matches_betas(ns):
    betas = gd.get_named_beta_schedule("linear", 1000)
    acp = np.cumprod(1 - betas)
    # at grid point t_i = (i+1)/N, alpha_t = sqrt(acp_i)
    for i in [0, 99, 499, 998]:
        t = jnp.float32((i + 1) / 1000)
        np.testing.assert_allclose(
            float(ns.marginal_alpha(t)), np.sqrt(acp[i]), rtol=1e-4
        )
    # alpha^2 + sigma^2 = 1
    t = jnp.float32(0.37)
    a, s = float(ns.marginal_alpha(t)), float(ns.marginal_std(t))
    assert a**2 + s**2 == pytest.approx(1.0, rel=1e-5)


def test_inverse_lambda_roundtrip(ns):
    for tv in [0.01, 0.1, 0.5, 0.9, 0.999]:
        t = jnp.float32(tv)
        lam = ns.marginal_lambda(t)
        back = float(ns.inverse_lambda(lam))
        assert back == pytest.approx(tv, abs=2e-3)


def _oracle_noise_fn(ns, x0):
    """True noise prediction for a delta-distribution data point."""

    def fn(x, t):
        t = jnp.broadcast_to(t, (x.shape[0],))
        a = ns.marginal_alpha(t).reshape(-1, *([1] * (x.ndim - 1)))
        s = ns.marginal_std(t).reshape(-1, *([1] * (x.ndim - 1)))
        return (x - a * x0) / s

    return fn


def _analytic_solution(ns, x0, xT, t_start=1.0, t_end=None):
    """Exact probability-flow solution for delta data: x(t) = a(t) x0 + s(t) c
    with c = eps(x_T) constant along the trajectory."""
    t_end = 1.0 / ns.total_N if t_end is None else t_end
    aT, sT = float(ns.marginal_alpha(jnp.float32(t_start))), float(
        ns.marginal_std(jnp.float32(t_start))
    )
    a0, s0 = float(ns.marginal_alpha(jnp.float32(t_end))), float(
        ns.marginal_std(jnp.float32(t_end))
    )
    c = (np.asarray(xT) - aT * np.asarray(x0)) / sT
    return a0 * np.asarray(x0) + s0 * c


def test_multistep_recovers_delta_data(ns):
    x0 = jnp.full((1, 16), 0.7)
    solver = DPMSolver(_oracle_noise_fn(ns, x0), ns)
    xT = jax.random.normal(jax.random.PRNGKey(0), (1, 16))
    expect = _analytic_solution(ns, x0, xT)
    for order in (1, 2, 3):
        out = solver.sample(xT, steps=20, order=order, method="multistep")
        np.testing.assert_allclose(np.asarray(out), expect, atol=5e-3)


def test_higher_order_converges_faster(ns):
    # data distribution N(mu, c^2): posterior-mean x0 estimate is linear in x_t
    mu, c = 0.5, 0.3

    def oracle(x, t):
        t = jnp.broadcast_to(t, (x.shape[0],))
        a = ns.marginal_alpha(t).reshape(-1, *([1] * (x.ndim - 1)))
        s = ns.marginal_std(t).reshape(-1, *([1] * (x.ndim - 1)))
        x0_hat = (a * c**2 * x + s**2 * mu) / (a**2 * c**2 + s**2)
        return (x - a * x0_hat) / s

    solver = DPMSolver(oracle, ns)
    xT = jax.random.normal(jax.random.PRNGKey(1), (64, 8))
    ref = solver.sample(xT, steps=200, order=3, method="multistep")
    err1 = float(jnp.abs(solver.sample(xT, steps=6, order=1) - ref).mean())
    err2 = float(jnp.abs(solver.sample(xT, steps=6, order=2) - ref).mean())
    assert err2 < err1


def test_adaptive_matches_multistep(ns):
    x0 = jnp.full((2, 8), -0.25)
    solver = DPMSolver(_oracle_noise_fn(ns, x0), ns)
    xT = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
    out = solver.sample(xT, order=2, method="adaptive")
    np.testing.assert_allclose(
        np.asarray(out), _analytic_solution(ns, x0, xT), atol=2e-2
    )


def test_lower_order_final_few_steps(ns):
    x0 = jnp.full((1, 4), 0.3)
    solver = DPMSolver(_oracle_noise_fn(ns, x0), ns)
    xT = jax.random.normal(jax.random.PRNGKey(3), (1, 4))
    out = solver.sample(xT, steps=5, order=2, method="multistep", lower_order_final=True)
    np.testing.assert_allclose(
        np.asarray(out), _analytic_solution(ns, x0, xT), atol=5e-2
    )


def test_jit_multistep_compiles_once(ns):
    x0 = jnp.zeros((1, 4))
    solver = DPMSolver(_oracle_noise_fn(ns, x0), ns)

    @jax.jit
    def run(xT):
        return solver.sample(xT, steps=30, order=2, method="multistep")

    out = run(jax.random.normal(jax.random.PRNGKey(4), (1, 4)))
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_dual_scale_algebra(ns):
    # dummy "model": output = conditioning value (constant per branch)
    def model(x, t, cond_val=None, static_latent=None):
        # static_latent distinguishes full-uncond (zeros) from uncond
        return cond_val + static_latent

    cond = {"cond_val": jnp.full((1, 4), 3.0), "static_latent": jnp.full((1, 4), 1.0)}
    uncond = {"cond_val": jnp.full((1, 4), 1.0), "static_latent": jnp.full((1, 4), 1.0)}
    fn = model_wrapper(
        model, ns, model_type="noise", guidance_type="classifier-free",
        condition=cond, unconditional_condition=uncond,
        guidance_scale=2.0, guidance_scale2=5.0,
    )
    x = jnp.zeros((1, 4))
    out = np.asarray(fn(x, jnp.float32(0.5)))
    # branches: full_uncond -> cond_val=1, static=0 -> 1
    #           uncond      -> 1 + 1 = 2 ; cond -> 3 + 1 = 4
    # e = 1 + 2*(2-1) + 5*(4-2) = 13
    np.testing.assert_allclose(out, 13.0, atol=1e-5)


def test_cfg_scale_one_single_branch(ns):
    calls = []

    def model(x, t, cond_val=None, static_latent=None):
        calls.append(x.shape[0])
        return jnp.zeros_like(x)

    cond = {"cond_val": jnp.zeros((2, 4)), "static_latent": jnp.zeros((2, 4))}
    fn = model_wrapper(
        model, ns, model_type="noise", guidance_type="classifier-free",
        condition=cond, unconditional_condition=cond,
        guidance_scale=1.0, guidance_scale2=1.0,
    )
    fn(jnp.zeros((2, 4)), jnp.float32(0.5))
    assert calls == [2]  # no 3-way batch when scales are 1


def test_v_model_conversion(ns):
    # v-model whose v equals get_v of a known x0 must give the oracle noise
    x0 = jnp.full((1, 8), 0.4)

    def v_model(x, t_input):
        # invert t_input -> t_continuous
        t_cont = t_input / 1000.0 + 1.0 / ns.total_N
        a = ns.marginal_alpha(t_cont).reshape(-1, 1)
        s = ns.marginal_std(t_cont).reshape(-1, 1)
        eps = (x - a * x0) / s
        return a * eps - s * x0  # v = alpha*eps - sigma*x0

    fn = model_wrapper(v_model, ns, model_type="v")
    solver = DPMSolver(fn, ns)
    xT = jax.random.normal(jax.random.PRNGKey(5), (1, 8))
    out = solver.sample(xT, steps=20, order=2)
    np.testing.assert_allclose(
        np.asarray(out), _analytic_solution(ns, x0, xT), atol=5e-3
    )
