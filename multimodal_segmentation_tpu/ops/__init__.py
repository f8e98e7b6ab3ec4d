"""Core compute ops: custom primitives used by the model components.

These replace the reference's TF-graph custom ops (layers/rounding.py,
layers/stn_spline.py, layers/interpolate_spline.py, layers/spectralnorm.py)
with TPU-friendly JAX implementations (jnp reference paths + Pallas kernels).
"""

from multimodal_segmentation_tpu.ops.rounding import round_ste
from multimodal_segmentation_tpu.ops.resample import bilinear_sample
from multimodal_segmentation_tpu.ops.tps import (
    control_grid,
    tps_sample_locations,
    tps_warp,
)
from multimodal_segmentation_tpu.ops.spectral import spectral_penalty
from multimodal_segmentation_tpu.ops.augment import random_rotate_batch

__all__ = [
    "round_ste",
    "bilinear_sample",
    "control_grid",
    "tps_sample_locations",
    "tps_warp",
    "spectral_penalty",
    "random_rotate_batch",
]
