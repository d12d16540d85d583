"""Tensor parallelism: shard parameter feature dims across the mesh.

The reference has no TP (SURVEY.md §2.2); these models are small so TP is an
*option*, not the default.  The TPU-native mechanism is declarative: assign
each large kernel a NamedSharding that splits its output-feature axis over a
mesh axis and let XLA's SPMD partitioner insert the all-gathers/reduces —
no manual collectives, matching the scaling-book recipe (annotate shardings,
let the compiler place comms).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.meshes import CONTEXT_AXIS


def tp_spec_for(path_leaf_name: str, shape, mesh_axis: str, axis_size: int):
    """PartitionSpec for one parameter: kernels shard their output-feature
    (last) dim when divisible; biases/norm params stay replicated."""
    if path_leaf_name == "kernel" and len(shape) >= 2 and \
            shape[-1] % axis_size == 0 and shape[-1] >= 2 * axis_size:
        return P(*([None] * (len(shape) - 1) + [mesh_axis]))
    return P()


def tp_shardings(params, mesh: Mesh, mesh_axis: str = CONTEXT_AXIS):
    """Pytree of NamedShardings mirroring ``params``."""
    axis_size = mesh.shape[mesh_axis]

    def spec(path, leaf):
        # path entries are DictKey (.key) for dict pytrees (flax params) or
        # GetAttrKey (.name) for namedtuples (optax opt-state)
        last = path[-1] if path else None
        name = str(getattr(last, "key", getattr(last, "name", "")))
        return NamedSharding(mesh,
                             tp_spec_for(name, leaf.shape, mesh_axis,
                                         axis_size))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params: Any, mesh: Mesh, mesh_axis: str = CONTEXT_AXIS):
    """device_put the params with TP shardings; computations jitted over
    these params are automatically partitioned by XLA."""
    return jax.device_put(params, tp_shardings(params, mesh, mesh_axis))
