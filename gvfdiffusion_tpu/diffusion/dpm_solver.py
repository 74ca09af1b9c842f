"""DPM-Solver++ for fast ODE sampling — TPU-native re-design.

Re-implements the capability surface of the reference's dpmsolver
(model/dpmsolver.py: NoiseScheduleVP :7, model_wrapper w/ dual-scale CFG
:171-347, DPM_Solver :354, adaptive :973, sample :1064) with JAX control flow:

  - multistep orders 1-3 compile to a single `lax.scan` — the whole 32/100-step
    denoise is ONE fused XLA graph (the core of the <10 s inference target)
  - the adaptive step-size solver (atol 0.0078, rtol 0.05, theta 0.9) is a
    `lax.while_loop` with a static max-NFE bound
  - dual-scale classifier-free guidance (CAT4D style): one 3-way-batched model
    call per NFE — full-uncond / static-only-uncond / cond — which on TPU is
    simply a 3x larger MXU batch (and the natural axis to shard over chips)

Solver math follows Lu et al., "DPM-Solver++" (arXiv:2211.01095).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class NoiseScheduleVP:
    """Discrete-time VP noise schedule with piecewise-linear log-alpha interp.

    alpha_t / sigma_t define q(x_t|x_0) = N(alpha_t x_0, sigma_t^2 I);
    lambda_t = log(alpha_t) - log(sigma_t) is the half-logSNR.
    """

    t_array: jnp.ndarray         # [N] continuous times (i+1)/N
    log_alpha_array: jnp.ndarray  # [N] log alpha at those times
    T: float = flax.struct.field(pytree_node=False, default=1.0)
    total_N: int = flax.struct.field(pytree_node=False, default=1000)

    @classmethod
    def from_betas(cls, betas: np.ndarray, clipped_lambda: float = -5.1):
        """Build from discrete betas; clips log-SNR near t=T for stability
        (cosine-schedule fix, reference model/dpmsolver.py:121-131)."""
        betas = np.asarray(betas, dtype=np.float64)
        log_alphas = 0.5 * np.cumsum(np.log(1.0 - betas))
        # numerical clip: drop tail entries whose lambda < clipped_lambda
        log_sigmas = 0.5 * np.log(1.0 - np.exp(2.0 * log_alphas))
        lambs = log_alphas - log_sigmas
        idx = np.searchsorted(lambs[::-1], clipped_lambda)
        if idx > 0:
            log_alphas = log_alphas[:-idx]
        n = len(log_alphas)
        # the t grid is rebuilt over the CLIPPED length — total_N shrinks with
        # it (reference model/dpmsolver.py:108-110: linspace over total_N
        # AFTER numerical_clip_alpha)
        t_array = np.linspace(0.0, 1.0, n + 1)[1:]
        return cls(
            t_array=jnp.asarray(t_array, jnp.float32),
            log_alpha_array=jnp.asarray(log_alphas, jnp.float32),
            T=1.0,
            total_N=n,
        )

    @classmethod
    def from_alphas_cumprod(cls, alphas_cumprod: np.ndarray, **kw):
        acp = np.asarray(alphas_cumprod, dtype=np.float64)
        betas = 1.0 - acp / np.concatenate([[1.0], acp[:-1]])
        return cls.from_betas(betas, **kw)

    def marginal_log_mean_coeff(self, t):
        # log_alpha decreases with t; t_array ascending -> jnp.interp
        return jnp.interp(t, self.t_array, self.log_alpha_array)

    def marginal_alpha(self, t):
        return jnp.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_mean = self.marginal_log_mean_coeff(t)
        log_std = 0.5 * jnp.log(1.0 - jnp.exp(2.0 * log_mean))
        return log_mean - log_std

    def inverse_lambda(self, lamb):
        log_alpha = -0.5 * jnp.logaddexp(0.0, -2.0 * lamb)
        # log_alpha_array is descending; flip for ascending interp
        return jnp.interp(
            log_alpha, self.log_alpha_array[::-1], self.t_array[::-1]
        )


def model_wrapper(
    model: Callable,
    noise_schedule: NoiseScheduleVP,
    model_type: str = "noise",  # "noise" | "x_start" | "v" | "score"
    model_kwargs: Optional[Dict[str, Any]] = None,
    guidance_type: str = "uncond",  # "uncond" | "classifier-free"
    condition: Optional[Dict[str, jnp.ndarray]] = None,
    unconditional_condition: Optional[Dict[str, jnp.ndarray]] = None,
    guidance_scale: float = 1.0,
    guidance_scale2: float = 1.0,
    zero_uncond_keys: tuple = ("static_latent",),
    cross_kv=None,
) -> Callable:
    """Wrap a discrete-time model into a continuous-time noise predictor with
    (optionally) dual-scale CFG (reference model/dpmsolver.py:171-347).

    The returned fn has signature model_fn(x, t_continuous) -> noise.

    Dual-scale CFG (CAT4D): eps = e_full_uncond
        + s1 * (e_static_uncond - e_full_uncond) + s2 * (e_cond - e_static_uncond)
    where the full-uncond branch additionally zeroes `zero_uncond_keys`.
    """
    model_kwargs = model_kwargs or {}

    def get_model_input_time(t_continuous):
        # [1/N, 1] -> [0, 1000*(N-1)/N]
        return (t_continuous - 1.0 / noise_schedule.total_N) * 1000.0

    def noise_pred_fn(x, t_continuous, cond=None):
        t_continuous = jnp.broadcast_to(t_continuous, (x.shape[0],))
        t_input = get_model_input_time(t_continuous)
        kwargs = dict(model_kwargs)
        if cond is not None:
            kwargs.update(cond)
        if cross_kv is not None:
            kwargs["cross_kv"] = cross_kv
        output = model(x, t_input, **kwargs)
        ed = lambda v: v.reshape(v.shape + (1,) * (x.ndim - 1))  # [B] -> [B,1,..]
        if model_type == "noise":
            return output
        if model_type == "x_start":
            alpha_t = ed(noise_schedule.marginal_alpha(t_continuous))
            sigma_t = ed(noise_schedule.marginal_std(t_continuous))
            return (x - alpha_t * output) / sigma_t
        if model_type == "v":
            alpha_t = ed(noise_schedule.marginal_alpha(t_continuous))
            sigma_t = ed(noise_schedule.marginal_std(t_continuous))
            return alpha_t * output + sigma_t * x
        if model_type == "score":
            sigma_t = ed(noise_schedule.marginal_std(t_continuous))
            return -sigma_t * output
        raise NotImplementedError(model_type)

    if guidance_type == "uncond":
        return lambda x, t: noise_pred_fn(x, t, cond=condition)

    assert guidance_type == "classifier-free"
    if (
        (guidance_scale == 1.0 and guidance_scale2 == 1.0)
        or unconditional_condition is None
    ):
        return lambda x, t: noise_pred_fn(x, t, cond=condition)

    def model_fn(x, t_continuous):
        x_in = jnp.concatenate([x] * 3)
        t_in = jnp.broadcast_to(t_continuous, (1,)) if t_continuous.ndim == 0 else t_continuous
        t_in = jnp.concatenate([jnp.broadcast_to(t_in, (x.shape[0],))] * 3)
        full_uncond = dict(unconditional_condition)
        for k in zero_uncond_keys:
            if k in full_uncond:
                full_uncond[k] = jnp.zeros_like(full_uncond[k])
        c_in = {}
        for k in condition:
            c_in[k] = jnp.concatenate(
                [full_uncond[k], unconditional_condition[k], condition[k]]
            )
        noise = noise_pred_fn(x_in, t_in, cond=c_in)
        e_fu, e_u, e_c = jnp.split(noise, 3)
        return (
            e_fu + guidance_scale * (e_u - e_fu) + guidance_scale2 * (e_c - e_u)
        )

    return model_fn


class DPMSolver:
    """DPM-Solver / DPM-Solver++ (data-prediction) sampler.

    model_fn(x, t_continuous[vector over batch or scalar]) -> noise prediction.
    """

    def __init__(
        self,
        model_fn: Callable,
        noise_schedule: NoiseScheduleVP,
        algorithm_type: str = "dpmsolver++",
    ):
        assert algorithm_type in ("dpmsolver", "dpmsolver++")
        self.model_fn_raw = model_fn
        self.ns = noise_schedule
        self.algorithm_type = algorithm_type

    def model_fn(self, x, t):
        """Data-prediction for dpmsolver++, noise-prediction otherwise."""
        noise = self.model_fn_raw(x, t)
        if self.algorithm_type == "dpmsolver++":
            alpha_t = self.ns.marginal_alpha(t)
            sigma_t = self.ns.marginal_std(t)
            return (x - sigma_t * noise) / alpha_t
        return noise

    # -- single-step updates ----------------------------------------------

    def first_update(self, x, s, t, model_s):
        ns = self.ns
        h = ns.marginal_lambda(t) - ns.marginal_lambda(s)
        if self.algorithm_type == "dpmsolver++":
            phi_1 = jnp.expm1(-h)
            return (ns.marginal_std(t) / ns.marginal_std(s)) * x - (
                ns.marginal_alpha(t) * phi_1
            ) * model_s
        phi_1 = jnp.expm1(h)
        return (
            jnp.exp(ns.marginal_log_mean_coeff(t) - ns.marginal_log_mean_coeff(s)) * x
            - ns.marginal_std(t) * phi_1 * model_s
        )

    def singlestep_second_update(self, x, s, t, r1=0.5, model_s=None):
        """Order-2 singlestep (used by the adaptive solver). Returns
        (x_t, model_s) so the lower-order estimate can reuse model_s."""
        ns = self.ns
        lambda_s, lambda_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
        h = lambda_t - lambda_s
        s1 = ns.inverse_lambda(lambda_s + r1 * h)
        sigma_s, sigma_s1, sigma_t = (
            ns.marginal_std(s), ns.marginal_std(s1), ns.marginal_std(t),
        )
        alpha_s1, alpha_t = ns.marginal_alpha(s1), ns.marginal_alpha(t)

        if model_s is None:
            model_s = self.model_fn(x, s)
        if self.algorithm_type == "dpmsolver++":
            phi_11 = jnp.expm1(-r1 * h)
            phi_1 = jnp.expm1(-h)
            x_s1 = (sigma_s1 / sigma_s) * x - alpha_s1 * phi_11 * model_s
            model_s1 = self.model_fn(x_s1, s1)
            x_t = (
                (sigma_t / sigma_s) * x
                - alpha_t * phi_1 * model_s
                - (0.5 / r1) * alpha_t * phi_1 * (model_s1 - model_s)
            )
        else:
            log_a = ns.marginal_log_mean_coeff
            phi_11 = jnp.expm1(r1 * h)
            phi_1 = jnp.expm1(h)
            x_s1 = jnp.exp(log_a(s1) - log_a(s)) * x - sigma_s1 * phi_11 * model_s
            model_s1 = self.model_fn(x_s1, s1)
            x_t = (
                jnp.exp(log_a(t) - log_a(s)) * x
                - sigma_t * phi_1 * model_s
                - (0.5 / r1) * sigma_t * phi_1 * (model_s1 - model_s)
            )
        return x_t, model_s

    def singlestep_third_update(self, x, s, t, r1=1.0 / 3.0, r2=2.0 / 3.0,
                                model_s=None, model_s1=None):
        """Order-3 singlestep (dpmsolver++ / 'dpmsolver' type). Returns
        (x_t, model_s, model_s1) so lower-order estimates can reuse them."""
        assert self.algorithm_type == "dpmsolver++"
        ns = self.ns
        lambda_s, lambda_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
        h = lambda_t - lambda_s
        s1 = ns.inverse_lambda(lambda_s + r1 * h)
        s2 = ns.inverse_lambda(lambda_s + r2 * h)
        sig = ns.marginal_std
        alp = ns.marginal_alpha
        phi_11 = jnp.expm1(-r1 * h)
        phi_12 = jnp.expm1(-r2 * h)
        phi_1 = jnp.expm1(-h)
        phi_22 = phi_12 / (r2 * h) + 1.0
        phi_2 = phi_1 / h + 1.0
        if model_s is None:
            model_s = self.model_fn(x, s)
        x_s1 = (sig(s1) / sig(s)) * x - alp(s1) * phi_11 * model_s
        if model_s1 is None:
            model_s1 = self.model_fn(x_s1, s1)
        x_s2 = (
            (sig(s2) / sig(s)) * x
            - alp(s2) * phi_12 * model_s
            + (r2 / r1) * alp(s2) * phi_22 * (model_s1 - model_s)
        )
        model_s2 = self.model_fn(x_s2, s2)
        x_t = (
            (sig(t) / sig(s)) * x
            - alp(t) * phi_1 * model_s
            + (1.0 / r2) * alp(t) * phi_2 * (model_s2 - model_s)
        )
        return x_t, model_s, model_s1

    def singlestep_update(self, x, s, t, order: int, r1=None, r2=None):
        if order == 1:
            return self.first_update(x, s, t, self.model_fn(x, s))
        if order == 2:
            return self.singlestep_second_update(x, s, t, r1=0.5 if r1 is None else r1)[0]
        if order == 3:
            return self.singlestep_third_update(
                x, s, t, r1=1.0 / 3.0 if r1 is None else r1,
                r2=2.0 / 3.0 if r2 is None else r2,
            )[0]
        raise ValueError(order)

    def get_orders_and_timesteps_for_singlestep_solver(
        self, steps: int, order: int, skip_type: str, t_T: float, t_0: float
    ):
        """DPM-Solver-fast order allocation (reference :499-560): combine
        orders 1-3 to spend exactly `steps` NFE."""
        if order == 3:
            k = steps // 3 + 1
            if steps % 3 == 0:
                orders = [3] * (k - 2) + [2, 1]
            elif steps % 3 == 1:
                orders = [3] * (k - 1) + [1]
            else:
                orders = [3] * (k - 1) + [2]
        elif order == 2:
            if steps % 2 == 0:
                orders = [2] * (steps // 2)
            else:
                orders = [2] * (steps // 2) + [1]
        elif order == 1:
            orders = [1] * steps
        else:
            raise ValueError(order)
        if skip_type == "logSNR":
            ts = self.get_time_steps(skip_type, t_T, t_0, len(orders))
        else:
            full = self.get_time_steps(skip_type, t_T, t_0, steps)
            idx = np.cumsum([0] + orders)
            ts = full[idx]
        return ts, orders

    # -- multistep updates -------------------------------------------------

    def multistep_second_update(self, x, m_prev, t_prev, t):
        """m_prev = (model[-2], model[-1]); t_prev = (t[-2], t[-1])."""
        ns = self.ns
        m1, m0 = m_prev
        t1, t0 = t_prev
        lam1, lam0, lam_t = (
            ns.marginal_lambda(t1), ns.marginal_lambda(t0), ns.marginal_lambda(t),
        )
        h0, h = lam0 - lam1, lam_t - lam0
        r0 = h0 / h
        d1_0 = (1.0 / r0) * (m0 - m1)
        if self.algorithm_type == "dpmsolver++":
            phi_1 = jnp.expm1(-h)
            return (
                (ns.marginal_std(t) / ns.marginal_std(t0)) * x
                - ns.marginal_alpha(t) * phi_1 * m0
                - 0.5 * ns.marginal_alpha(t) * phi_1 * d1_0
            )
        phi_1 = jnp.expm1(h)
        log_a = ns.marginal_log_mean_coeff
        return (
            jnp.exp(log_a(t) - log_a(t0)) * x
            - ns.marginal_std(t) * phi_1 * m0
            - 0.5 * ns.marginal_std(t) * phi_1 * d1_0
        )

    def multistep_third_update(self, x, m_prev, t_prev, t):
        ns = self.ns
        m2, m1, m0 = m_prev
        t2, t1, t0 = t_prev
        lam2, lam1, lam0, lam_t = (
            ns.marginal_lambda(t2), ns.marginal_lambda(t1),
            ns.marginal_lambda(t0), ns.marginal_lambda(t),
        )
        h1, h0, h = lam1 - lam2, lam0 - lam1, lam_t - lam0
        r0, r1 = h0 / h, h1 / h
        d1_0 = (1.0 / r0) * (m0 - m1)
        d1_1 = (1.0 / r1) * (m1 - m2)
        d1 = d1_0 + (r0 / (r0 + r1)) * (d1_0 - d1_1)
        d2 = (1.0 / (r0 + r1)) * (d1_0 - d1_1)
        if self.algorithm_type == "dpmsolver++":
            phi_1 = jnp.expm1(-h)
            phi_2 = phi_1 / h + 1.0
            phi_3 = phi_2 / h - 0.5
            a_t = ns.marginal_alpha(t)
            return (
                (ns.marginal_std(t) / ns.marginal_std(t0)) * x
                - a_t * phi_1 * m0
                + a_t * phi_2 * d1
                - a_t * phi_3 * d2
            )
        phi_1 = jnp.expm1(h)
        phi_2 = phi_1 / h - 1.0
        phi_3 = phi_2 / h - 0.5
        log_a = ns.marginal_log_mean_coeff
        s_t = ns.marginal_std(t)
        return (
            jnp.exp(log_a(t) - log_a(t0)) * x
            - s_t * phi_1 * m0
            - s_t * phi_2 * d1
            - s_t * phi_3 * d2
        )

    def multistep_update(self, x, m_hist, t_hist, t, order: int):
        """Dispatch on (static) order using the most recent entries."""
        if order == 1:
            return self.first_update(x, t_hist[-1], t, m_hist[-1])
        if order == 2:
            return self.multistep_second_update(x, m_hist[-2:], t_hist[-2:], t)
        if order == 3:
            return self.multistep_third_update(x, m_hist[-3:], t_hist[-3:], t)
        raise ValueError(f"order must be 1..3, got {order}")

    # -- time grids --------------------------------------------------------

    def get_time_steps(self, skip_type: str, t_T: float, t_0: float, N: int) -> np.ndarray:
        if skip_type == "time_uniform":
            return np.linspace(t_T, t_0, N + 1, dtype=np.float64)
        if skip_type == "time_quadratic":
            return np.linspace(t_T**0.5, t_0**0.5, N + 1, dtype=np.float64) ** 2
        if skip_type == "logSNR":
            lam_T = float(self.ns.marginal_lambda(jnp.float32(t_T)))
            lam_0 = float(self.ns.marginal_lambda(jnp.float32(t_0)))
            lams = np.linspace(lam_T, lam_0, N + 1)
            return np.asarray(self.ns.inverse_lambda(jnp.asarray(lams, jnp.float32)))
        raise ValueError(f"unsupported skip_type {skip_type}")

    # -- sampling ----------------------------------------------------------

    def sample(
        self,
        x: jnp.ndarray,
        steps: int = 20,
        t_start: Optional[float] = None,
        t_end: Optional[float] = None,
        order: int = 2,
        skip_type: str = "time_uniform",
        method: str = "multistep",
        lower_order_final: bool = True,
        atol: float = 0.0078,
        rtol: float = 0.05,
        return_info: bool = False,
    ) -> jnp.ndarray:
        t_0 = 1.0 / self.ns.total_N if t_end is None else t_end
        t_T = self.ns.T if t_start is None else t_start
        if method == "adaptive":
            return self._sample_adaptive(
                x, order, t_T, t_0, atol=atol, rtol=rtol,
                return_info=return_info)
        if method in ("singlestep", "singlestep_fixed"):
            if method == "singlestep_fixed":
                k = steps // order
                orders = [order] * k
                ts_np = self.get_time_steps(skip_type, t_T, t_0, k)
            else:
                ts_np, orders = self.get_orders_and_timesteps_for_singlestep_solver(
                    steps, order, skip_type, t_T, t_0
                )
            for i, o in enumerate(orders):
                s_i, t_i = float(ts_np[i]), float(ts_np[i + 1])
                # intermediate-point ratios from an inner skip_type grid in
                # lambda space (reference model/dpmsolver.py:1239-1245)
                inner = jnp.asarray(
                    self.get_time_steps(skip_type, s_i, t_i, max(o, 1)), jnp.float32
                )
                lam = self.ns.marginal_lambda(inner)
                h = lam[-1] - lam[0]
                r1 = None if o <= 1 else (lam[1] - lam[0]) / h
                r2 = None if o <= 2 else (lam[2] - lam[0]) / h
                x = self.singlestep_update(
                    x, jnp.float32(s_i), jnp.float32(t_i), o, r1=r1, r2=r2
                )
            return x
        assert method == "multistep", f"unsupported method {method}"
        assert steps >= order
        ts = jnp.asarray(
            self.get_time_steps(skip_type, t_T, t_0, steps), jnp.float32
        )

        # warmup: first `order` model values via increasing-order updates
        m_hist = [self.model_fn(x, ts[0])]
        t_hist = [ts[0]]
        for step in range(1, order):
            x = self.multistep_update(x, m_hist, t_hist, ts[step], step)
            t_hist.append(ts[step])
            m_hist.append(self.model_fn(x, ts[step]))

        use_lower_final = lower_order_final and steps < 10
        if use_lower_final:
            # few steps: unroll with per-step order
            for step in range(order, steps + 1):
                step_order = min(order, steps + 1 - step)
                x = self.multistep_update(x, m_hist, t_hist, ts[step], step_order)
                t_hist = t_hist[1:] + [ts[step]]
                if step < steps:
                    m_hist = m_hist[1:] + [self.model_fn(x, ts[step])]
            return x

        # main loop: constant order -> lax.scan (one compiled graph)
        m_buf = jnp.stack(m_hist)  # [order, ...]
        t_buf = jnp.stack(t_hist)  # [order]

        def body(carry, t_next):
            x, m_buf, t_buf = carry
            x = self.multistep_update(x, list(m_buf), list(t_buf), t_next, order)
            t_buf = jnp.concatenate([t_buf[1:], t_next[None]])
            m_new = self.model_fn(x, t_next)
            m_buf = jnp.concatenate([m_buf[1:], m_new[None]])
            return (x, m_buf, t_buf), None

        if steps > order:
            (x, m_buf, t_buf), _ = jax.lax.scan(
                body, (x, m_buf, t_buf), ts[order:steps]
            )
        # final step: update only, no model eval (reference :1227-1229)
        x = self.multistep_update(x, list(m_buf), list(t_buf), ts[steps], order)
        return x

    def inverse(
        self,
        x: jnp.ndarray,
        steps: int = 20,
        t_start: Optional[float] = None,
        t_end: Optional[float] = None,
        order: int = 2,
        skip_type: str = "time_uniform",
        method: str = "multistep",
    ) -> jnp.ndarray:
        """Invert a sample from t_start (default 1/N) to t_end (default T):
        DDIM-style encoding to noise by running the solver in reverse time
        (reference model/dpmsolver.py:1150-1160)."""
        t_0 = 1.0 / self.ns.total_N if t_start is None else t_start
        t_T = self.ns.T if t_end is None else t_end
        return self.sample(
            x, steps=steps, t_start=t_0, t_end=t_T, order=order,
            skip_type=skip_type, method=method, lower_order_final=False,
        )

    def _sample_adaptive(
        self,
        x: jnp.ndarray,
        order: int,
        t_T: float,
        t_0: float,
        h_init: float = 0.05,
        atol: float = 0.0078,
        rtol: float = 0.05,
        theta: float = 0.9,
        t_err: float = 1e-5,
        max_iters: int = 200,
        return_info: bool = False,
    ):
        """Adaptive step-size solver (orders 2-3), reference model/dpmsolver.py:973.

        lax.while_loop with a static iteration bound; each iteration costs
        `order` NFE.
        """
        assert order in (2, 3), "adaptive solver supports order 2 or 3"
        ns = self.ns
        lambda_0 = ns.marginal_lambda(jnp.float32(t_0))

        def cond(state):
            x, x_prev, s, h, i = state
            return jnp.logical_and(jnp.abs(s - t_0) > t_err, i < max_iters)

        def body(state):
            x, x_prev, s, h, i = state
            lambda_s = ns.marginal_lambda(s)
            t = ns.inverse_lambda(lambda_s + h)
            if order == 2:
                model_s = self.model_fn(x, s)
                x_lower = self.first_update(x, s, t, model_s)
                x_higher, _ = self.singlestep_second_update(
                    x, s, t, r1=0.5, model_s=model_s
                )
            else:
                x_lower, model_s = self.singlestep_second_update(x, s, t, r1=1.0 / 3.0)
                x_higher, _, _ = self.singlestep_third_update(
                    x, s, t, model_s=model_s
                )
            delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_lower), jnp.abs(x_prev)))
            err = jnp.sqrt(jnp.mean(((x_higher - x_lower) / delta) ** 2))
            accept = err <= 1.0
            x_new = jnp.where(accept, x_higher, x)
            x_prev_new = jnp.where(accept, x_lower, x_prev)
            s_new = jnp.where(accept, t, s)
            lambda_new = ns.marginal_lambda(s_new)
            h_new = jnp.minimum(
                theta * h * jnp.power(jnp.maximum(err, 1e-10), -1.0 / order),
                lambda_0 - lambda_new,
            )
            return (x_new, x_prev_new, s_new, h_new, i + 1)

        s0 = jnp.float32(t_T)
        state = (x, x, s0, jnp.float32(h_init), jnp.int32(0))
        x, _, _, _, iters = jax.lax.while_loop(cond, body, state)
        if return_info:
            # each iteration (accepted or rejected) costs `order` model calls
            # (reference model/dpmsolver.py:1018 nfe += order)
            return x, {"nfe": iters * order, "iters": iters}
        return x
