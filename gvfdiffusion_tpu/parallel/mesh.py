"""Device mesh + sharding utilities.

The TPU-native replacement for the reference's Accelerate/NCCL DDP stack
(SURVEY.md §5.9; reference train_latent.py:42-48): a `jax.sharding.Mesh` over
ICI with named axes, batch sharded over "data", parameters replicated (pure
DP, matching the reference's parallelism surface) — gradient all-reduce is
inserted by XLA inside the compiled train step. The mesh also carries a
"model" axis so tensor-parallel shardings can be layered on without changing
call sites.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DIST_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host (DCN) hook: call once per process before building meshes.

    Wraps `jax.distributed.initialize`, which wires the cross-host runtime so
    `jax.devices()` spans every host's chips (collectives then ride ICI
    within a slice and DCN across slices — the scaling-book recipe). On a
    single host (the v5e-8 target, and this image) it is a documented no-op:
    with no coordinator configured (args or JAX_COORDINATOR_ADDRESS /
    auto-detected TPU metadata) the local-process default stands.

    Returns the process count (1 when single-host).
    """
    global _DIST_INITIALIZED
    configured = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if configured and not _DIST_INITIALIZED:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _DIST_INITIALIZED = True
    return jax.process_count()


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """1-D (or reshaped) mesh over the first n_devices GLOBAL devices.

    After init_distributed on multi-host, jax.devices() is the global device
    list, so the same call sites scale from one host to a DCN-connected pod
    without change; single-host it is the local chips."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.asarray(devices)
    if len(axes) > 1:
        # fill trailing axes with 1 unless divisible split requested
        shape = [len(devices)] + [1] * (len(axes) - 1)
        arr = arr.reshape(shape)
    return Mesh(arr, axis_names=tuple(axes))


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array in a pytree with its batch dim sharded over `axis`."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim, axis)), batch
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)
