"""Shared building blocks: conv blocks, normalisation, upsampling.

Reference semantics: models/unet.py:94-101 (conv_block) and
utils/model_utils.py:6-24 (normalise / upsample_block).
"""

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

he_normal = nn.initializers.he_normal()
glorot_uniform = nn.initializers.glorot_uniform()
glorot_normal = nn.initializers.glorot_normal()


def leaky_relu(x, alpha=0.3):
    """Keras LeakyReLU default alpha is 0.3 (used where the reference calls
    LeakyReLU() with no argument, e.g. model_components/modality_encoder.py)."""
    return nn.leaky_relu(x, negative_slope=alpha)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalisation over spatial dims.

    Matches keras_contrib InstanceNormalization (utils/model_utils.py:3;
    layers/spade.py:27 uses scale=False, center=False). Statistics always
    compute in f32 regardless of the activation dtype.
    """

    epsilon: float = 1e-3
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = ((x - mean) / jnp.sqrt(var + self.epsilon)).astype(in_dtype)
        c = x.shape[-1]
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (c,))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (c,))
        return y


class Norm(nn.Module):
    """Switchable normalisation ('batch' | 'instance' | none).

    Matches utils/model_utils.py:6-13. BatchNorm hyperparameters follow
    Keras 2.1.6 defaults (momentum 0.99, epsilon 1e-3).
    """

    kind: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "batch":
            # BN statistics in f32 even under bf16 activations
            in_dtype = x.dtype
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=jnp.float32,
            )(x.astype(jnp.float32))
            return y.astype(in_dtype)
        if self.kind == "instance":
            return InstanceNorm()(x)
        return x


class ConvBlock(nn.Module):
    """[Conv3x3(he_normal) -> norm -> relu] x 2 (models/unet.py:94-101)."""

    filters: int
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, (3, 3), padding="SAME", kernel_init=he_normal,
                    dtype=self.dtype)(x)
        x = Norm(self.norm)(x, train)
        x = nn.relu(x)
        x = nn.Conv(self.filters, (3, 3), padding="SAME", kernel_init=he_normal,
                    dtype=self.dtype)(x)
        x = Norm(self.norm)(x, train)
        return nn.relu(x)


def upsample2x(x):
    """Nearest-neighbour 2x upsampling (Keras UpSampling2D)."""
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class UpsampleBlock(nn.Module):
    """Upsample2x -> Conv3x3 -> norm -> activation (utils/model_utils.py:15-24)."""

    filters: int
    norm: str = "batch"
    activation: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample2x(x)
        x = nn.Conv(self.filters, (3, 3), padding="SAME", kernel_init=he_normal,
                    dtype=self.dtype)(x)
        x = Norm(self.norm)(x, train)
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "leakyrelu":
            return leaky_relu(x)
        return x  # 'linear'


def max_pool2(x):
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
