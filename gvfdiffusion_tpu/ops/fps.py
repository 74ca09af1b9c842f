"""Farthest-point sampling — TPU-native replacement for torch_cluster.fps
(used by the reference at model/autoencoder.py:525, utils/inference_utils.py:195,
encode_latent.py:134).

Iterative argmax of running min-distance via `lax.fori_loop`: O(K*N) with
static shapes, vmappable over the batch. The distance table lives in
registers/VMEM-sized chunks — XLA fuses the min+argmax reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_samples",))
def fps(points: jnp.ndarray, num_samples: int, start_idx: int = 0) -> jnp.ndarray:
    """Sample `num_samples` indices from [N, 3] points, maximizing spread.

    Deterministic (starts from `start_idx`, as torch_cluster does with
    random_start=False). Returns int32 indices [num_samples].
    """
    n = points.shape[0]
    points = points.astype(jnp.float32)

    def body(i, state):
        min_d2, idxs = state
        last = points[idxs[i - 1]]
        d2 = jnp.sum((points - last) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        idxs = idxs.at[i].set(jnp.argmax(min_d2).astype(jnp.int32))
        return min_d2, idxs

    idxs = jnp.zeros((num_samples,), jnp.int32).at[0].set(start_idx)
    min_d2 = jnp.full((n,), jnp.inf, jnp.float32)
    _, idxs = jax.lax.fori_loop(1, num_samples, body, (min_d2, idxs))
    return idxs


@functools.partial(jax.jit, static_argnames=("num_samples",))
def fps_batched(points: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """[B, N, 3] -> [B, num_samples] int32 indices."""
    return jax.vmap(lambda p: fps(p, num_samples))(points)


@functools.partial(jax.jit, static_argnames=("num_samples",))
def fps_masked(points: jnp.ndarray, valid: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """FPS over a padded point set: `valid` [N] bool masks real points.

    Padded entries never get selected (their distance is forced to -inf).
    Needed because variable-length Gaussian sets are padded to static shapes.
    """
    n = points.shape[0]
    points = points.astype(jnp.float32)
    neg = jnp.where(valid, 0.0, -jnp.inf)

    first = jnp.argmax(valid).astype(jnp.int32)  # first valid point

    def body(i, state):
        min_d2, idxs = state
        last = points[idxs[i - 1]]
        d2 = jnp.sum((points - last) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        idxs = idxs.at[i].set(jnp.argmax(min_d2 + neg).astype(jnp.int32))
        return min_d2, idxs

    idxs = jnp.zeros((num_samples,), jnp.int32).at[0].set(first)
    min_d2 = jnp.full((n,), jnp.inf, jnp.float32)
    _, idxs = jax.lax.fori_loop(1, num_samples, body, (min_d2, idxs))
    return idxs
