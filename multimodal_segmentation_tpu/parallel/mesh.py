"""Device mesh + sharding helpers (SURVEY.md §5.8).

Single-device semantics everywhere: model code never sees the mesh; the
train step is jitted with NamedShardings and GSPMD partitions it. Gradient
psum / sync-BN come from XLA's partitioner, riding ICI on a real slice.

Multi-host: call jax.distributed.initialize() before make_mesh() on each
host (DCN between hosts, ICI within a slice); jax.devices() then spans the
full slice and the same code scales out.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch dict with the batch axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
