"""Parallelism layer: device mesh construction and shardings.

The reference is strictly single-GPU (SURVEY.md §2 parallelism table); this
layer is the TPU-native scale-out path: a jax.sharding.Mesh with a 'data'
axis (and a 'model' axis reserved for tensor-parallel experiments), batches
sharded over 'data', parameters replicated, XLA/GSPMD inserting the ICI
collectives (gradient all-reduce, global batch-norm statistics).
"""

from multimodal_segmentation_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch"]
