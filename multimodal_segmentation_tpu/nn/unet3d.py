"""3-D UNet building blocks for the volumetric stretch models.

Reference scope: BASELINE.json configs[4] — multi-sequence cardiac
LGE+bSSFP+T2 *volumes*, the stretch beyond the reference's 2-D 192x192
slice models (the reference has no 3-D path at all; SURVEY.md §5.7).

TPU-first design decisions:

* Volumes are (B, D, H, W, C) with the slice axis D sharded over the
  'space' mesh axis when a volume exceeds one chip's HBM. Inside `jit`
  the model only places `with_sharding_constraint` hints; XLA's SPMD
  partitioner inserts the halo exchanges for the kd=3 convolutions
  (the explicit ppermute formulation of the same exchange lives in
  parallel/halo.py::halo_conv3d and is tested bit-exact against the
  unsharded conv).
* Pooling/upsampling act on H and W only. Cardiac MR is anisotropic
  (~8-10 mm slice gap vs ~1.5 mm in-plane), so isotropic downsampling is
  wrong physically — and keeping D fixed means the 'space' sharding of
  the slice axis is never re-partitioned across the UNet.
* Normalisation is instance norm over (D, H, W) computed in f32; under
  GSPMD the cross-shard reduction over the sharded D axis is inserted
  automatically.
"""

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_segmentation_tpu.nn.blocks import he_normal


class InstanceNorm3D(nn.Module):
    """Per-sample, per-channel norm over (D, H, W); stats in f32."""

    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3), keepdims=True)
        inv = jax.lax.rsqrt(var + self.epsilon).astype(in_dtype)
        y = (x - mean.astype(in_dtype)) * inv
        c = x.shape[-1]
        y = y * self.param("scale", nn.initializers.ones, (c,)).astype(in_dtype)
        y = y + self.param("bias", nn.initializers.zeros, (c,)).astype(in_dtype)
        return y


class ConvBlock3D(nn.Module):
    """[Conv3x3x3 -> instance norm -> relu] x 2."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.filters, (3, 3, 3), padding="SAME",
                        kernel_init=he_normal, dtype=self.dtype)(x)
            x = InstanceNorm3D()(x)
            x = nn.relu(x)
        return x


def max_pool_hw(x):
    """2x2/stride-2 max pool over H, W only (D untouched).

    Reshape + reduce-max like blocks.max_pool2: the backward is a fused
    elementwise compare instead of XLA select-and-scatter.
    """
    b, d, h, w, c = x.shape
    if h % 2 or w % 2:
        # odd H/W (volume_shape not divisible by 2^downsample3d): fall
        # back to the windowed pool, same as blocks.max_pool2
        return nn.max_pool(x, window_shape=(1, 2, 2), strides=(1, 2, 2))
    xr = x.reshape(b, d, h // 2, 2, w // 2, 2, c)
    return jnp.max(xr, axis=(3, 5))


def upsample2x_hw(x):
    """Nearest-neighbour 2x upsampling over H, W only."""
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


class UNet3D(nn.Module):
    """Anisotropic 3-D UNet: downsample H/W, keep the slice axis D.

    Mirrors the reference UNet topology (models/unet.py:16-101) lifted to
    volumes: conv blocks with skip connections, configurable depth.
    """

    filters: int = 16
    downsample: int = 3
    out_channels: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips: List = []
        for level in range(self.downsample):
            s = ConvBlock3D(self.filters * (2 ** level), self.dtype)(x, train)
            skips.append(s)
            x = max_pool_hw(s)
        x = ConvBlock3D(self.filters * (2 ** self.downsample), self.dtype)(x, train)
        for level in reversed(range(self.downsample)):
            f = self.filters * (2 ** level)
            x = upsample2x_hw(x)
            x = nn.Conv(f, (3, 3, 3), padding="SAME", kernel_init=he_normal,
                        dtype=self.dtype)(x)
            x = jnp.concatenate([x, skips[level]], axis=-1)
            x = ConvBlock3D(f, self.dtype)(x, train)
        x = nn.Conv(self.out_channels, (1, 1, 1), padding="SAME")(x)
        return nn.softmax(x.astype(jnp.float32), axis=-1)
