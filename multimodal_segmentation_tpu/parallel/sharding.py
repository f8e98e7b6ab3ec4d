"""Parameter sharding rules: optional tensor parallelism over 'model'.

The parity models are small 2-D conv nets, so pure data parallelism is the
production configuration (SURVEY.md §2). For wide layers (the UNet
bottleneck runs 1024-channel 3x3 convs) the output-channel dimension can
additionally be sharded over the 'model' mesh axis: parameters and the
mirrored Adam moments live split across devices, and GSPMD inserts the
activation collectives. This halves per-device optimizer+param memory for
the sharded layers and is the template for scaling to the 3-D stretch
models.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(x, n_model, min_features):
    shape = getattr(x, "shape", ())
    if (
        len(shape) >= 2
        and shape[-1] >= min_features
        and shape[-1] % n_model == 0
    ):
        return P(*([None] * (len(shape) - 1)), "model")
    return P()


def tp_shard_train_state(mesh: Mesh, ts, min_features: int = 256):
    """Device-put a TrainState with wide parameter leaves (and their
    mirrored optimizer moments / SWA copies) sharded over 'model'.

    Because the Adam mu/nu and the SWA average mirror the parameter leaf
    shapes, the same by-shape rule shards them consistently; everything
    else (scalars, small layers, PRNG keys) replicates.
    """
    n_model = mesh.shape["model"]

    def place(x):
        if not hasattr(x, "shape"):
            return x
        spec = _leaf_spec(x, n_model, min_features) if n_model > 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, ts)


def count_sharded_leaves(mesh: Mesh, tree, min_features: int = 256):
    n_model = mesh.shape["model"]
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(
        1
        for l in leaves
        if _leaf_spec(l, n_model, min_features) != P()
    )
