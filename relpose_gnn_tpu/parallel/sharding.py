"""NamedSharding helpers: batch sharding + tensor-parallel param shardings.

Strategy (SURVEY.md §7): batch data-parallelism over the `data` axis is the
workload's primary strategy; the wide (2048/4096/6144-dim) GNN MLP weights
additionally shard over the `model` axis so a multi-chip mesh exercises real
tp+dp. XLA inserts the all-reduces (gradients over `data`, activation
reductions over `model`).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from relpose_gnn_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over `data`, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, tree):
    """Apply batch sharding to every array in a pytree."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), tree)


# -- tensor-parallel parameter shardings -----------------------------------

def _gnn_kernel_spec(path: tuple, leaf) -> P:
    """Partition spec for one parameter, keyed on its tree path.

    The GNN MLP kernels are the widest matrices in the model; shard
    alternating layers' kernels column-/row-wise over `model`
    (Megatron-style: fc1 column-parallel, fc2 row-parallel, so the pair
    needs a single all-reduce).  Everything else is replicated.
    """
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    joined = "/".join(str(n) for n in names)
    if leaf.ndim == 2 and ("gnn" in joined or "proj_edge" in joined):
        if "fc1" in joined or "proj_edge" in joined:
            return P(None, MODEL_AXIS)   # column parallel
        if "fc2" in joined:
            return P(MODEL_AXIS, None)   # row parallel
    if leaf.ndim == 1 and ("gnn" in joined) and "fc1" in joined:
        return P(MODEL_AXIS)
    return P()


def param_sharding(mesh: Mesh, params, tensor_parallel: bool = True):
    """NamedShardings for a model param tree: replicated, or tp over `model`.

    Constraint: a column-parallel bias/kernel output dim must divide the
    model-axis size; call sites pick dims accordingly (2048 % n_model == 0).
    """
    def spec_for(path, leaf):
        if not tensor_parallel:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _gnn_kernel_spec(path, leaf))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params, tensor_parallel: bool = True):
    shardings = param_sharding(mesh, params, tensor_parallel)
    return jax.tree.map(jax.device_put, params, shardings)
