"""Sharding rules: replicated params (+ optional TP on wide layers),
batch-sharded data.

Design (scaling-book recipe): pick the mesh, annotate shardings on the
arguments, let XLA insert collectives. For this workload:

  * every model is small (<40M params) -> params REPLICATED over the mesh;
    the wide RNA-encoder GEMMs (5005x1024, 5005x512) can optionally be
    tensor-parallel over the 'model' axis (kernel sharded on the output
    feature dim, the following layer on the input dim — Megatron column/row
    pattern) when model_parallel > 1,
  * batches sharded over 'data' (the per-epoch index arrays are sharded on
    their batch axis, so every gather/encoder/backward shards, and XLA
    all-gathers the (B,) hazards for the global Cox risk-set loss),
  * batch-stats: computed over the GLOBAL batch (XLA reduces across shards),
    which exactly reproduces the reference's single-device BatchNorm.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(tree, mesh: Mesh):
    """Place every leaf replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch_dim(x, mesh: Mesh, axis_name: str = "data", axis: int = 0):
    """Shard one array along `axis` over `axis_name`, replicated elsewhere."""
    spec = [None] * x.ndim
    spec[axis] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-dim batch sharding (rank-agnostic: a PartitionSpec shorter
    than the array rank leaves trailing dims replicated) — the sharding a
    host->device input prefetcher applies to every batch leaf."""
    return NamedSharding(mesh, P(axis_name))


def _is_wide_kernel(path: tuple, leaf) -> bool:
    """TP rule: Dense kernels with out-features >= 512 get column-parallel
    sharding (last dim over 'model')."""
    return (
        getattr(leaf, "ndim", 0) == 2
        and leaf.shape[-1] >= 512
        and any("dense" in str(k).lower() or "kernel" in str(k) for k in path)
    )


def param_shardings(params, mesh: Mesh, tensor_parallel: bool = False):
    """NamedSharding tree for a param pytree.

    Default: fully replicated. With tensor_parallel and a 'model' axis of
    size > 1: wide Dense kernels column-sharded, their biases likewise.
    """
    model_size = mesh.shape.get("model", 1)

    def rule(path, leaf):
        if tensor_parallel and model_size > 1 and _is_wide_kernel(path, leaf):
            spec = [None] * leaf.ndim
            spec[-1] = "model"
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def apply_shardings(tree, shardings):
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
