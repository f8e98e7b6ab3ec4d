"""Modality (intensity) VAE encoder.

Reference: model_components/modality_encoder.py:13-52. Takes the anatomy map
and the image, returns (z, z_mean, z_log_var, kl). The reparameterised
sample uses the module's 'sample' RNG stream (replacing the Lambda(sampling)
of utils/sdnet_utils.py:9-21); the KL divergence per sample matches
costs.py:186-189.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_segmentation_tpu.nn.blocks import he_normal, leaky_relu


class ModalityEncoder(nn.Module):
    num_z: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, anatomy, image, train: bool = False, sample: bool = True):
        x = jnp.concatenate(
            [anatomy.astype(self.dtype), image.astype(self.dtype)], axis=-1
        )
        for f in (16, 32, 64, 128):
            # Keras Conv2D default padding is VALID (modality_encoder.py:35-43)
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding="VALID",
                        kernel_init=he_normal, dtype=self.dtype)(x)
            x = leaky_relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(32, kernel_init=he_normal, dtype=self.dtype)(x)
        x = leaky_relu(x)
        # VAE heads in f32: exp(log_var) and the KL need the range
        x = x.astype(jnp.float32)
        z_mean = nn.Dense(self.num_z, name="z_mean")(x)
        z_log_var = nn.Dense(self.num_z, name="z_log_var")(x)

        if sample:
            eps = jax.random.normal(self.make_rng("sample"), z_mean.shape,
                                    dtype=z_mean.dtype)
            z = z_mean + jnp.exp(0.5 * z_log_var) * eps
        else:
            z = z_mean

        # KL divergence per sample, shape (B, 1) (costs.py:186-189)
        kl = -0.5 * jnp.sum(
            1.0 + z_log_var - jnp.square(z_mean) - jnp.exp(z_log_var), axis=-1
        )
        return z, z_mean, z_log_var, kl[:, None]
