"""Gaussian diffusion process math — pure functional JAX.

Re-designs the reference's DDPM port (reference: model/gaussian_diffusion.py:128
`GaussianDiffusion`, itself a port of Ho et al.) as a stateless coefficient
table + pure functions, so every sampler compiles to a single fused XLA graph
via `lax.scan`. Coefficients are precomputed in float64 numpy (as the
reference does at model/gaussian_diffusion.py:160) and stored float32.

Supported, matching the reference capability surface:
  - beta schedules: linear / cosine / cosine_light / sigmoid
    (reference model/gaussian_diffusion.py:35-70)
  - mean parameterizations: eps / x0 / v / xprev (ModelMeanType)
  - variance types: fixed_small / fixed_large / learned / learned_range
  - min-SNR-5 loss weighting (reference :799-806)
  - dynamic thresholding (reference :198-230)
  - ancestral (p_sample) and DDIM sampling loops, VLB/bpd terms

Channel convention: channels LAST (B, ..., C) — TPU-native layout (the lane
dimension maps to C); the reference uses channel-first torch layout.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Beta schedules (precompute in numpy float64)
# ---------------------------------------------------------------------------


def _cosine_window(t, start=0.0, end=1.0, tau=1.0):
    v_start = math.cos(start * math.pi / 2) ** (2 * tau)
    v_end = math.cos(end * math.pi / 2) ** (2 * tau)
    out = np.cos((t * (end - start) + start) * math.pi / 2) ** (2 * tau)
    return (v_end - out) / (v_end - v_start)


def _sigmoid_window(t, start=0.0, end=3.0, tau=0.1):
    sig = lambda x: 1.0 / (1.0 + np.exp(-x))
    v_start, v_end = sig(start / tau), sig(end / tau)
    out = sig((t * (end - start) + start) / tau)
    return (v_end - out) / (v_end - v_start)


def betas_for_alpha_bar(num_steps: int, alpha_bar: Callable, max_beta=0.999) -> np.ndarray:
    """Discretize a continuous alpha_bar(t) into per-step betas."""
    i = np.arange(num_steps, dtype=np.float64)
    t1, t2 = i / num_steps, (i + 1) / num_steps
    return np.minimum(1.0 - alpha_bar(t2) / alpha_bar(t1), max_beta)


def get_named_beta_schedule(
    name: str, num_steps: int, beta_start=0.0001, beta_end=0.02
) -> np.ndarray:
    if name == "linear":
        scale = 1000.0 / num_steps
        return np.linspace(scale * beta_start, scale * beta_end, num_steps, dtype=np.float64)
    if name == "cosine":
        return betas_for_alpha_bar(
            num_steps, lambda t: np.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        )
    if name == "cosine_light":
        return betas_for_alpha_bar(num_steps, lambda t: _cosine_window(t, 0.2, 1.0, 3.0))
    if name == "sigmoid":
        return betas_for_alpha_bar(num_steps, lambda t: _sigmoid_window(t, 0.0, 3.0, 0.1))
    raise NotImplementedError(f"unknown beta schedule: {name}")


# ---------------------------------------------------------------------------
# The process
# ---------------------------------------------------------------------------

MEAN_TYPES = ("eps", "x0", "v", "xprev")
VAR_TYPES = ("fixed_small", "fixed_large", "learned", "learned_range")


def _bcast(coef: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather coef[t] (t shaped [B]) and right-pad dims to broadcast over x."""
    out = coef[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1).mean(axis=1)


@flax.struct.dataclass
class GaussianDiffusion:
    """Coefficient tables + static config for a (possibly respaced) process.

    Build with `create_diffusion` (or `respace.spaced_diffusion`). All array
    fields have shape [num_timesteps].
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    # Respacing: maps this process's timestep index -> original-process index
    # (identity when not respaced). Model is always called with mapped t.
    timestep_map: jnp.ndarray
    # static (non-pytree) config
    mean_type: str = flax.struct.field(pytree_node=False, default="eps")
    var_type: str = flax.struct.field(pytree_node=False, default="fixed_small")
    min_snr: bool = flax.struct.field(pytree_node=False, default=False)
    rescale_timesteps: bool = flax.struct.field(pytree_node=False, default=False)
    original_num_steps: int = flax.struct.field(pytree_node=False, default=1000)

    # -- basics ------------------------------------------------------------

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    def scaled_model_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """Timestep value handed to the model: respace-mapped (+ optional
        1000/T rescale, reference model/respace.py:165-170)."""
        mt = self.timestep_map[t].astype(jnp.float32)
        if self.rescale_timesteps:
            mt = mt * (1000.0 / self.original_num_steps)
        return mt

    # -- q (forward) -------------------------------------------------------

    def q_mean_variance(self, x_start, t):
        mean = _bcast(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        variance = _bcast(1.0 - self.alphas_cumprod, t, x_start.ndim)
        log_variance = _bcast(self.log_one_minus_alphas_cumprod, t, x_start.ndim)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        return (
            _bcast(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _bcast(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        mean = (
            _bcast(self.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _bcast(self.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        variance = _bcast(self.posterior_variance, t, x_t.ndim)
        log_variance = _bcast(self.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, variance, log_variance

    def get_v(self, x_start, noise, t):
        return (
            _bcast(self.sqrt_alphas_cumprod, t, x_start.ndim) * noise
            - _bcast(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * x_start
        )

    # -- parameterization conversions -------------------------------------

    def predict_xstart_from_eps(self, x_t, t, eps):
        return (
            _bcast(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _bcast(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
        )

    def predict_xstart_from_v(self, x_t, t, v):
        return (
            _bcast(self.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
            - _bcast(self.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
        )

    def predict_xstart_from_xprev(self, x_t, t, xprev):
        c1 = _bcast(1.0 / self.posterior_mean_coef1, t, x_t.ndim)
        c2 = _bcast(self.posterior_mean_coef2 / self.posterior_mean_coef1, t, x_t.ndim)
        return c1 * xprev - c2 * x_t

    def predict_eps_from_xstart(self, x_t, t, x_start):
        return (
            _bcast(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x_start
        ) / _bcast(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    # -- p (reverse) -------------------------------------------------------

    def p_mean_variance(
        self,
        model: Callable,
        x: jnp.ndarray,
        t: jnp.ndarray,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        dynamic_threshold: Optional[float] = 0.99,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, jnp.ndarray]:
        """One reverse-step distribution p(x_{t-1} | x_t).

        `model(x, t_scaled, **kwargs)` returns channels-last output; for
        learned variance types the last axis is 2C (mean ++ var values).

        clip_denoised matches the reference exactly (model/gaussian_diffusion.py
        :198-215, 340-346): with dynamic_threshold set (default 0.99) the
        predicted x0 is clipped to its per-sample |x0| quantile — NOT
        rescaled, NOT clamped to [-1,1]; with dynamic_threshold=None it falls
        back to the vanilla [-1,1] clamp.
        """
        model_kwargs = model_kwargs or {}
        model_output = model(x, self.scaled_model_t(t), **model_kwargs)

        if self.var_type in ("learned", "learned_range"):
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            if self.var_type == "learned":
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _bcast(self.posterior_log_variance_clipped, t, x.ndim)
                max_log = _bcast(jnp.log(self.betas), t, x.ndim)
                frac = (model_var_values + 1.0) / 2.0
                model_log_variance = frac * max_log + (1.0 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        elif self.var_type == "fixed_large":
            # betas with posterior_variance[1] at t=0 (reference :317-327)
            var = jnp.concatenate([self.posterior_variance[1:2], self.betas[1:]])
            model_variance = _bcast(var, t, x.ndim)
            model_log_variance = _bcast(jnp.log(var), t, x.ndim)
        else:  # fixed_small
            model_variance = _bcast(self.posterior_variance, t, x.ndim)
            model_log_variance = _bcast(self.posterior_log_variance_clipped, t, x.ndim)

        def process_xstart(x0):
            if denoised_fn is not None:
                x0 = denoised_fn(x0)
            if clip_denoised:
                if dynamic_threshold is not None:
                    # per-sample quantile clip of |x0| (reference
                    # dynamic_thresholding, model/gaussian_diffusion.py:198)
                    flat = jnp.abs(x0.reshape(x0.shape[0], -1))
                    s = jnp.quantile(flat, dynamic_threshold, axis=1)
                    s = s.reshape((-1,) + (1,) * (x0.ndim - 1))
                    x0 = jnp.clip(x0, -s, s)
                else:
                    x0 = jnp.clip(x0, -1.0, 1.0)
            return x0

        if self.mean_type == "xprev":
            pred_xstart = process_xstart(self.predict_xstart_from_xprev(x, t, model_output))
            model_mean = model_output
        else:
            if self.mean_type == "x0":
                pred_xstart = process_xstart(model_output)
            elif self.mean_type == "eps":
                pred_xstart = process_xstart(self.predict_xstart_from_eps(x, t, model_output))
            elif self.mean_type == "v":
                pred_xstart = process_xstart(self.predict_xstart_from_v(x, t, model_output))
            else:
                raise NotImplementedError(self.mean_type)
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    # -- sampling loops (lax.scan — whole chain is ONE compiled graph) ----

    def p_sample_loop(
        self,
        model: Callable,
        shape,
        rng: jax.Array,
        noise: Optional[jnp.ndarray] = None,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        dynamic_threshold: Optional[float] = None,
        model_kwargs: Optional[Dict[str, Any]] = None,
        inpainting_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Ancestral sampling x_T -> x_0.

        inpainting_mask (reference model/gaussian_diffusion.py:425-459):
        broadcastable to x; 1 = resample, 0 = keep the current value
        (known region) at every step.
        """
        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, shape) if noise is None else noise

        def step(carry, t):
            x, rng = carry
            rng, step_rng = jax.random.split(rng)
            tb = jnp.full((shape[0],), t, dtype=jnp.int32)
            out = self.p_mean_variance(
                model, x, tb, clip_denoised, denoised_fn, dynamic_threshold, model_kwargs
            )
            z = jax.random.normal(step_rng, x.shape)
            nonzero = (t != 0).astype(x.dtype)
            x_next = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * z
            if inpainting_mask is not None:
                x_next = (1 - inpainting_mask) * x + inpainting_mask * x_next
            return (x_next, rng), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (x, _), _ = jax.lax.scan(step, (x, rng), ts)
        return x

    def ddim_sample_loop(
        self,
        model: Callable,
        shape,
        rng: jax.Array,
        noise: Optional[jnp.ndarray] = None,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        dynamic_threshold: Optional[float] = None,
        model_kwargs: Optional[Dict[str, Any]] = None,
        eta: float = 0.0,
        inpainting_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """DDIM sampling x_T -> x_0 (inpainting_mask as in p_sample_loop,
        reference model/gaussian_diffusion.py:466-531)."""
        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, shape) if noise is None else noise

        def step(carry, t):
            x, rng = carry
            rng, step_rng = jax.random.split(rng)
            tb = jnp.full((shape[0],), t, dtype=jnp.int32)
            out = self.p_mean_variance(
                model, x, tb, clip_denoised, denoised_fn, dynamic_threshold, model_kwargs
            )
            eps = self.predict_eps_from_xstart(x, tb, out["pred_xstart"])
            acp = _bcast(self.alphas_cumprod, tb, x.ndim)
            acp_prev = _bcast(self.alphas_cumprod_prev, tb, x.ndim)
            sigma = (
                eta
                * jnp.sqrt((1 - acp_prev) / (1 - acp))
                * jnp.sqrt(1 - acp / acp_prev)
            )
            mean = (
                out["pred_xstart"] * jnp.sqrt(acp_prev)
                + jnp.sqrt(1 - acp_prev - sigma**2) * eps
            )
            z = jax.random.normal(step_rng, x.shape)
            nonzero = (t != 0).astype(x.dtype)
            x_next = mean + nonzero * sigma * z
            if inpainting_mask is not None:
                x_next = (1 - inpainting_mask) * x + inpainting_mask * x_next
            return (x_next, rng), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (x, _), _ = jax.lax.scan(step, (x, rng), ts)
        return x

    # -- likelihood evaluation ----------------------------------------------

    def calc_bpd_loop(
        self,
        model: Callable,
        x_start: jnp.ndarray,
        rng: jax.Array,
        clip_denoised: bool = True,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Full variational bound in bits-per-dim (reference
        model/gaussian_diffusion.py:880-934) as ONE lax.scan over t.

        Returns dict(total_bpd [B], prior_bpd [B], vb/xstart_mse/mse [B, T]),
        with t descending along axis 1 like the reference's loop order.
        """
        B = x_start.shape[0]

        def step(rng, t):
            rng, krng = jax.random.split(rng)
            tb = jnp.full((B,), t, dtype=jnp.int32)
            noise = jax.random.normal(krng, x_start.shape, x_start.dtype)
            x_t = self.q_sample(x_start, tb, noise)
            out = self._vb_terms(
                model, x_start, x_t, tb, clip_denoised, model_kwargs=model_kwargs
            )
            xstart_mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
            eps = self.predict_eps_from_xstart(x_t, tb, out["pred_xstart"])
            mse = mean_flat((eps - noise) ** 2)
            return rng, (out["output"], xstart_mse, mse)

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        _, (vb, xstart_mse, mse) = jax.lax.scan(step, rng, ts)
        vb = jnp.swapaxes(vb, 0, 1)  # [B, T], t descending
        xstart_mse = jnp.swapaxes(xstart_mse, 0, 1)
        mse = jnp.swapaxes(mse, 0, 1)

        qt_mean, _, qt_log_var = self.q_mean_variance(
            x_start, jnp.full((B,), self.num_timesteps - 1, jnp.int32)
        )
        from .losses import normal_kl

        prior = normal_kl(
            qt_mean, jnp.broadcast_to(qt_log_var, x_start.shape),
            jnp.zeros_like(x_start), jnp.zeros_like(x_start),
        )
        prior_bpd = mean_flat(prior) / math.log(2.0)
        return {
            "total_bpd": vb.sum(axis=1) + prior_bpd,
            "prior_bpd": prior_bpd,
            "vb": vb,
            "xstart_mse": xstart_mse,
            "mse": mse,
        }

    # -- training ----------------------------------------------------------

    def training_losses(
        self,
        model: Callable,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        rng: jax.Array,
        model_kwargs: Optional[Dict[str, Any]] = None,
        noise: Optional[jnp.ndarray] = None,
    ):
        """MSE training loss vs the configured target (reference :781-862).

        Returns (terms dict with 'loss' [B], aux dict with x_t/model_output).
        """
        model_kwargs = model_kwargs or {}
        if noise is None:
            noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)

        if self.min_snr:
            alpha = self.sqrt_alphas_cumprod[t]
            sigma = self.sqrt_one_minus_alphas_cumprod[t]
            snr = (alpha / sigma) ** 2
            w = jnp.minimum(snr, 5.0)
            mse_weight = jnp.where(snr == 0, 1.0, w)
        else:
            mse_weight = jnp.ones_like(t, dtype=x_start.dtype)

        model_output = model(x_t, self.scaled_model_t(t), **model_kwargs)

        terms = {}
        if self.var_type in ("learned", "learned_range"):
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
            )
            terms["vb"] = self._vb_terms(
                lambda *a, **k: frozen, x_start, x_t, t, clip_denoised=False
            )["output"]

        target = {
            "xprev": lambda: self.q_posterior_mean_variance(x_start, x_t, t)[0],
            "x0": lambda: x_start,
            "eps": lambda: noise,
            "v": lambda: self.get_v(x_start, noise, t),
        }[self.mean_type]()
        terms["mse"] = mean_flat((target - model_output) ** 2)
        terms["loss"] = terms["mse"] * mse_weight + terms.get("vb", 0.0)
        return terms, {"x_t": x_t, "model_output": model_output}

    def _vb_terms(self, model, x_start, x_t, t, clip_denoised=True, model_kwargs=None):
        from .losses import discretized_gaussian_log_likelihood, normal_kl

        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(model, x_t, t, clip_denoised, model_kwargs=model_kwargs)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / math.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll) / math.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}


def create_diffusion(
    *,
    schedule: str = "cosine",
    steps: int = 1000,
    mean_type: str = "v",
    var_type: str = "fixed_small",
    min_snr: bool = False,
    rescale_timesteps: bool = False,
    betas: Optional[np.ndarray] = None,
) -> GaussianDiffusion:
    """Build a full (non-respaced) diffusion process.

    Mirrors utils/script_util.py:7 `create_gaussian_diffusion` defaults:
    cosine schedule + v-prediction is the reference training config
    (configs/diffusion.yml:16-25).
    """
    if betas is None:
        betas = get_named_beta_schedule(schedule, steps)
    return diffusion_from_betas(
        betas,
        mean_type=mean_type,
        var_type=var_type,
        min_snr=min_snr,
        rescale_timesteps=rescale_timesteps,
        timestep_map=np.arange(len(betas)),
        original_num_steps=steps,
    )


def diffusion_from_betas(
    betas: np.ndarray,
    *,
    mean_type: str,
    var_type: str,
    min_snr: bool = False,
    rescale_timesteps: bool = False,
    timestep_map: Optional[np.ndarray] = None,
    original_num_steps: Optional[int] = None,
) -> GaussianDiffusion:
    """Derive every coefficient table from betas (float64 precompute)."""
    assert mean_type in MEAN_TYPES and var_type in VAR_TYPES
    betas = np.asarray(betas, dtype=np.float64)
    assert (betas > 0).all() and (betas <= 1).all()
    n = len(betas)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    acp_next = np.append(acp[1:], 0.0)
    posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    if timestep_map is None:
        timestep_map = np.arange(n)
    return GaussianDiffusion(
        betas=f32(betas),
        alphas_cumprod=f32(acp),
        alphas_cumprod_prev=f32(acp_prev),
        alphas_cumprod_next=f32(acp_next),
        sqrt_alphas_cumprod=f32(np.sqrt(acp)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - acp)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
        posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
        mean_type=mean_type,
        var_type=var_type,
        min_snr=min_snr,
        rescale_timesteps=rescale_timesteps,
        original_num_steps=original_num_steps or n,
    )
