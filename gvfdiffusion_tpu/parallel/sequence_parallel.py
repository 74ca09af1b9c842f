"""Sequence parallelism for the motion-VAE decoder.

The reference chunks the motion VAE's GS-query cross-attention at 8192
queries per chunk to fit memory (model/autoencoder.py:552-607). On a mesh,
those query chunks are INDEPENDENT — the TPU-native scaling move is to shard
the query axis across chips ("sequence parallel" for a perceiver decoder):
every chip holds the full (small) latent set and decodes its slice of the
queries; no collectives are needed until the results reassemble.

`decode_sequence_parallel` wraps MotionVAE.decode in shard_map over a
('seq',) mesh axis. Padding to a multiple of the axis size is handled here.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def decode_sequence_parallel(
    vae,
    vae_params: Any,
    latent: jnp.ndarray,       # [B*T, L, latent_dim]
    queries: jnp.ndarray,      # [B, Q, gs_dim] padded static GS
    num_timesteps: int,
    mesh: Mesh,
    axis: str = "seq",
) -> jnp.ndarray:
    """Returns [B, T, Q, out_dim]; Q sharded over `axis` during decode."""
    n_shards = mesh.shape[axis]
    b, q, gs_dim = queries.shape
    pad = (-q) % n_shards
    if pad:
        queries = jnp.pad(queries, ((0, 0), (0, pad), (0, 0)))

    def local_decode(latent_l, queries_l):
        return vae.apply(
            vae_params, latent_l, queries_l, num_timesteps,
            method=type(vae).decode,
        )

    fn = shard_map(
        local_decode,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(None, None, axis, None),
        check_rep=False,
    )
    out = fn(latent, queries)
    return out[:, :, :q]
