"""multimodal_segmentation_tpu — TPU-native multimodal segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
agis85/multimodal_segmentation (MMSDNet / DAFNet: disentangled multimodal MRI
segmentation with TPS-STN anatomy fusion, FiLM/SPADE decoders, LSGAN
discriminators and semi-supervised training), built TPU-first:

* every sub-network is a functional flax.linen module,
* the reference's 5-fit/16-predict per-batch choreography compiles into a
  single XLA training-step program,
* the hot custom ops (thin-plate-spline warp, straight-through rounding,
  spectral power-iteration) are JAX primitives with custom VJPs and Pallas
  kernels,
* scaling uses jax.sharding over a device mesh (ICI collectives), not host
  loops.

Reference behaviour citations in docstrings point into the upstream repo
(file:line) for parity checking.
"""

__version__ = "0.1.0"
