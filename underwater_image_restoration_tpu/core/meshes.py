"""Device-mesh construction and sharding helpers.

The reference is strictly single-device (reference ``main.py:25-29``; no
``torch.distributed`` anywhere).  The TPU-native design scales through a
``jax.sharding.Mesh`` with two logical axes:

- ``data``    — batch (data-parallel) axis; gradients are ``psum``-reduced
                over ICI by XLA.
- ``context`` — window/pixel-token axis for context parallelism of the
                window-attention models (windows are independent; shifted
                windows need only a halo ``ppermute``, see ``parallel/``).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
CONTEXT_AXIS = "context"


def make_mesh(data: int = -1, context: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % context == 0, f"{n} devices not divisible by context={context}"
        data = n // context
    assert data * context <= n, (
        f"mesh {data}x{context} needs {data * context} devices, have {n}"
    )
    devs = np.asarray(devices[: data * context]).reshape(data, context)
    return Mesh(devs, (DATA_AXIS, CONTEXT_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of host arrays with the batch dim sharded."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
