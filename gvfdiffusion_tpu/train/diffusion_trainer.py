"""Diffusion (DiT) training step — one jitted SPMD program.

Replaces the reference TrainLoop.forward_backward/optimize
(train_latent.py:183-229): q-sample -> DiT -> MSE(v-target) -> clip -> AdamW
-> warmup -> EMA, with DP expressed as batch sharding over the mesh "data"
axis (gradient all-reduce rides ICI inside the compiled step).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..diffusion.gaussian_diffusion import GaussianDiffusion
from ..diffusion.resample import uniform_sampler
from .train_state import TrainState, apply_updates


def make_train_step(
    model_apply: Callable,
    diffusion: GaussianDiffusion,
    tx: optax.GradientTransformation,
    ema_rate: float = 0.9999,
):
    """Build `train_step(state, batch, rng) -> (state, metrics)`.

    batch: dict with
      latent        [B, T, N, C]  x_start (reparameterized, normalized)
      cond_images   [B, T, L, Ci]
      static_latent [B, Ns, Cs]
      positions     [B, N, 3]
    """

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        t_rng, noise_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        x_start = batch["latent"]
        t, weights = uniform_sampler(t_rng, x_start.shape[0], diffusion.num_timesteps)

        def loss_fn(params):
            def model_fn(x, tt, **kw):
                return model_apply(
                    params, x, tt,
                    cond_images=batch["cond_images"],
                    static_latent=batch["static_latent"],
                    positions=batch.get("positions"),
                )

            terms, aux = diffusion.training_losses(
                model_fn, x_start, t, noise_rng
            )
            loss = jnp.mean(terms["loss"] * weights)
            return loss, terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        new_state = apply_updates(state, grads, tx, ema_rate)
        metrics = {
            "loss": loss,
            "mse": jnp.mean(terms["mse"]),
            "grad_norm": gnorm,
        }
        return new_state, metrics

    return train_step
