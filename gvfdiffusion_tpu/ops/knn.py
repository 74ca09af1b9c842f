"""Brute-force K-nearest-neighbors + Gaussian-weighted delta interpolation.

TPU-native replacement for pytorch3d.ops.knn_points (reference uses it at
model/autoencoder.py:467 and train_vae.py:525). At the reference's sizes
(N <= 8192) a full pairwise-distance matrix is a single MXU-friendly matmul:
||a-b||^2 = |a|^2 + |b|^2 - 2 a.b, followed by top_k. No spatial trees needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def knn_points(query: jnp.ndarray, points: jnp.ndarray, k: int):
    """query [B, Q, 3], points [B, N, 3] -> (dists [B, Q, k], idx [B, Q, k]).

    Squared L2 distances, ascending, matching pytorch3d.knn_points semantics.
    """
    q2 = jnp.sum(query**2, axis=-1, keepdims=True)  # [B,Q,1]
    p2 = jnp.sum(points**2, axis=-1)[:, None, :]  # [B,1,N]
    # HIGHEST: default TPU bf16 matmul gives ~4e-3 d2 error, enough to flip
    # the adaptive-radius mask and neighbor ranking; full-f32 costs little here
    qp = jnp.einsum("bqc,bnc->bqn", query, points,
                    precision=jax.lax.Precision.HIGHEST)  # MXU
    d2 = jnp.maximum(q2 + p2 - 2.0 * qp, 0.0)
    neg_d, idx = jax.lax.top_k(-d2, k)
    return -neg_d, idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "adaptive_radius"))
def interpolate_deltas(
    anchors: jnp.ndarray,
    static_pc: jnp.ndarray,
    deltas: jnp.ndarray,
    k: int = 8,
    beta: float = 7.0,
    adaptive_radius: bool = True,
) -> jnp.ndarray:
    """KNN-interpolate per-point motion deltas onto anchor positions.

    Mirrors the reference's compute_delta_interp (model/autoencoder.py:450-501):
    adaptive radius = sqrt(mean k-NN squared distance); weights
    exp(-beta * d2 / radius^2) masked to d2 <= radius^2, normalized.

    anchors   [B, A, 3]    positions to interpolate onto (e.g. FPS anchors)
    static_pc [B, N, 3]    canonical point cloud
    deltas    [B, T, N, 3] per-frame displacement of each point
    returns   [B, T, A, 3]
    """
    d2, idx = knn_points(anchors, static_pc, k)  # [B,A,k]
    radii = jnp.sqrt(jnp.mean(d2, axis=-1)) + 1e-6  # [B,A]
    if adaptive_radius:
        r2 = radii[..., None] ** 2
        mask = (d2 <= r2).astype(d2.dtype)
        w = jnp.exp(-beta * d2 / r2) * mask
    else:
        w = jnp.exp(-beta * d2)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-8)  # [B,A,k]

    # gather neighbor deltas: [B, T, A, k, 3]
    nbr = jnp.take_along_axis(
        deltas[:, :, None], idx[:, None, :, :, None], axis=3
    )
    out = jnp.einsum("bak,btakc->btac", w, nbr)
    return jax.lax.stop_gradient(out)
