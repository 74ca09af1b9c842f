"""Parameter sharding rules: DP + tensor parallelism over a 2-D mesh.

The reference scales by DP only (SURVEY.md §5.9); TPU-native scaling wants
the ("data", "model") mesh from the start. These rules shard the DiT's wide
matmuls over "model" — attention qkv/out projections and MLP in/out — which
is exactly Megatron-style TP: XLA inserts the all-reduces over ICI when the
jitted step consumes the sharded params.

Usage:
    specs = dit_param_specs(params)                  # pytree of PartitionSpec
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    params = jax.device_put(params, shardings)
    step = jax.jit(fn, in_shardings=(shardings, ...))
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import PartitionSpec as P


def _spec_for(path_names, leaf) -> P:
    """Sharding for one parameter, keyed by its module path."""
    path = "/".join(path_names)
    ndim = leaf.ndim
    if ndim < 2:
        return P()  # biases, norms, gammas: replicated
    # column-parallel: project INTO the sharded dimension
    if any(k in path for k in ("to_qkv", "to_q", "to_kv", "mlp_0", "net_0")):
        return P(None, "model")
    # row-parallel: contract FROM the sharded dimension
    if any(k in path for k in ("to_out", "mlp_2", "net_2")):
        return P("model", None)
    return P()


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree for a model's params (TP over 'model')."""

    def spec(path, leaf):
        names = [getattr(k, "key", getattr(k, "idx", str(k))) for k in path]
        return _spec_for([str(n) for n in names], leaf)

    return jax.tree_util.tree_map_with_path(spec, params)


def batch_specs(batch: Any, axis: str = "data") -> Any:
    """PartitionSpec pytree sharding every leaf's leading dim over `axis`."""
    return jax.tree.map(lambda x: P(axis, *([None] * (x.ndim - 1))), batch)
