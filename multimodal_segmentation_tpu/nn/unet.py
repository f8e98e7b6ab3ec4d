"""Configurable-depth UNet (reference models/unet.py:16-101).

Split into Down / Up halves so the DAFNet dual-encoder variant
(model_components/anatomy_encoder.py:32-73: private downsample paths,
shared bottleneck + upsample path) composes them with parameter sharing.
"""

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp

from flax import linen as nn

from multimodal_segmentation_tpu.nn.blocks import ConvBlock, UpsampleBlock, max_pool2


class UNetDown(nn.Module):
    """Downsample path; returns (bottom_input, skips) like unet_downsample
    (models/unet.py:37-52). skips[i] is the pre-pool activation at level i."""

    filters: int = 64
    downsample: int = 4
    norm: str = "batch"
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, groups: int = 1):
        assert self.downsample > 0, "Unet downsample must be over 0."
        skips = []
        f = self.filters
        for level in range(self.downsample):
            s = ConvBlock(f * (2 ** level), self.norm, self.dtype,
                          self.remat)(x, train, groups)
            skips.append(s)
            x = max_pool2(s)
        return x, skips


class UNetBottleneck(nn.Module):
    """Bottleneck conv block (models/unet.py:54-63): filters = f * 2^downsample."""

    filters: int = 64
    downsample: int = 4
    norm: str = "batch"
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, groups: int = 1):
        flt = self.filters * (2 ** self.downsample)
        return ConvBlock(flt, self.norm, self.dtype,
                         self.remat)(x, train, groups)


class UNetUp(nn.Module):
    """Upsample path with skip concatenation (models/unet.py:65-86)."""

    filters: int = 64
    downsample: int = 4
    norm: str = "batch"
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, skips: List, train: bool = False, groups: int = 1):
        for level in reversed(range(self.downsample)):
            f = self.filters * (2 ** level)
            x = UpsampleBlock(f, self.norm, activation="linear",
                              dtype=self.dtype, remat=self.remat)(x, train, groups)
            x = jnp.concatenate([x, skips[level]], axis=-1)
            x = ConvBlock(f, self.norm, self.dtype, self.remat)(x, train, groups)
        return x


class UNet(nn.Module):
    """Full UNet with a 1x1 output conv (models/unet.py:27-92).

    out_activation: None picks sigmoid/softmax by out_channels like the
    reference's `out` (models/unet.py:88-92).
    """

    filters: int = 64
    downsample: int = 4
    norm: str = "batch"
    out_channels: int = 1
    out_activation: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x, skips = UNetDown(self.filters, self.downsample, self.norm)(x, train)
        x = UNetBottleneck(self.filters, self.downsample, self.norm)(x, train)
        x = UNetUp(self.filters, self.downsample, self.norm)(x, skips, train)
        x = nn.Conv(self.out_channels, (1, 1), padding="SAME")(x)
        act = self.out_activation
        if act is None:
            act = "sigmoid" if self.out_channels == 1 else "softmax"
        if act == "sigmoid":
            return nn.sigmoid(x)
        if act == "softmax":
            return nn.softmax(x, axis=-1)
        return x
