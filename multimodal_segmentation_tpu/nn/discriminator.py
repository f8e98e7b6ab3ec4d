"""LSGAN discriminator with spectral-norm regularisation.

Reference: models/discriminator.py:9-45 (DCGAN downsample stack, valid
padding, LeakyReLU 0.2, Dense(1) head) and layers/spectralnorm.py:199-246
(the Spectral kernel regularizer on every downsample-block conv).

The spectral power-iteration vector `u` lives in the 'spectral' variable
collection; the per-conv penalties are summed and exposed in the
'spectral_loss' collection (read by the discriminator train step only —
the generators treat the discriminator as frozen, and the penalty has zero
gradient w.r.t. generator parameters, matching the reference where frozen
discriminators contribute a constant regulariser term).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_segmentation_tpu.nn.blocks import he_normal
from multimodal_segmentation_tpu.ops.spectral import spectral_penalty


class SpectralConv(nn.Module):
    """VALID 4x4 conv whose kernel carries the spectral penalty."""

    features: int
    stride: int = 2
    alpha: float = 10.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", he_normal, (4, 4, in_ch, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(self.dtype)

        dim = 4 * 4 * in_ch

        def init_u():
            # reference layers/spectralnorm.py:213: uniform(-1, 1)
            return jax.random.uniform(
                self.make_rng("params"), (dim, 1), minval=-1.0, maxval=1.0
            )

        u = self.variable("spectral", "u", init_u)
        penalty, new_u = spectral_penalty(kernel, u.value, alpha=self.alpha)
        if not self.is_initializing() and not self.is_mutable_collection("params"):
            if self.is_mutable_collection("spectral"):
                u.value = new_u
        self.sow("spectral_loss", "penalty", penalty)
        return y


class Discriminator(nn.Module):
    """LSGAN discriminator (models/discriminator.py:16-42).

    filters=64 for DAFNet mask/image discriminators, 4 for the MMSDNet mask
    discriminator (configuration/*_config_chaos.py d_mask_params).
    """

    filters: int = 64
    downsample_blocks: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.downsample_blocks > 1
        f = self.filters
        x = nn.Conv(f, (4, 4), strides=(2, 2), padding="VALID",
                    kernel_init=he_normal, dtype=self.dtype)(x.astype(self.dtype))
        x = nn.leaky_relu(x, negative_slope=0.2)
        for i in range(self.downsample_blocks):
            stride = 1 if i == self.downsample_blocks - 1 else 2
            x = SpectralConv(f * 2 * (2 ** i), stride=stride,
                             dtype=self.dtype)(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = x.reshape(x.shape[0], -1)
        # LSGAN head in f32
        return nn.Dense(1)(x.astype(jnp.float32))
