"""Training-timestep schedule samplers (reference: model/resample.py:8-57)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_sampler(rng: jax.Array, batch: int, num_timesteps: int):
    """Uniform timesteps + unit importance weights (reference UniformSampler)."""
    t = jax.random.randint(rng, (batch,), 0, num_timesteps, dtype=jnp.int32)
    weights = jnp.ones((batch,), dtype=jnp.float32)
    return t, weights


def static_sampler(rng: jax.Array, batch: int, num_timesteps: int, value: int = 0):
    """Fixed-timestep sampler (reference StaticSampler, model/resample.py:51)."""
    del rng
    t = jnp.full((batch,), value, dtype=jnp.int32)
    weights = jnp.ones((batch,), dtype=jnp.float32)
    return t, weights
