"""Anatomy encoders: UNet body -> 1x1 softmax conv -> straight-through rounding.

Reference: model_components/anatomy_encoder.py.
* `AnatomyEncoder` = the single-modality encoder (build(), :13-30) used by
  MMSDNet (one fully-private encoder per modality).
* `DualAnatomyEncoder` = the DAFNet variant (AnatomyEncoders, :32-73): each
  modality has a private downsample path, while the bottleneck, the whole
  upsample path and the final 1x1 conv are shared between modalities.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from multimodal_segmentation_tpu.ops.batching import (
    batch_deinterleave,
    batch_interleave,
)
from multimodal_segmentation_tpu.nn.blocks import he_normal
from multimodal_segmentation_tpu.nn.unet import UNetBottleneck, UNetDown, UNetUp
from multimodal_segmentation_tpu.ops.rounding import round_ste


class AnatomyEncoder(nn.Module):
    """Single-modality anatomy encoder (anatomy_encoder.py:13-30)."""

    filters: int = 64
    downsample: int = 4
    norm: str = "batch"
    out_channels: int = 8
    rounding: bool = True
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x, skips = UNetDown(self.filters, self.downsample, self.norm,
                            self.dtype, self.remat)(x, train)
        x = UNetBottleneck(self.filters, self.downsample, self.norm,
                           self.dtype, self.remat)(x, train)
        x = UNetUp(self.filters, self.downsample, self.norm,
                   self.dtype, self.remat)(x, skips, train)
        x = nn.Conv(
            self.out_channels, (1, 1), padding="SAME", name="conv_anatomy",
            dtype=self.dtype,
        )(x)
        # softmax in f32 for stability, output in compute dtype
        s = nn.softmax(x.astype(jnp.float32), axis=-1).astype(self.dtype)
        if self.rounding:
            s = round_ste(s)
        return s


class DualAnatomyEncoder(nn.Module):
    """Two anatomy encoders with private downsampling and a shared decoder.

    Reference anatomy_encoder.py:32-73: the shared part spans the bottleneck
    conv block (l0_1..l0_6), every upsample stage (l1..l40) and the final
    softmax conv; only the per-modality UNetDown paths are private.
    """

    filters: int = 64
    downsample: int = 4
    norm: str = "batch"
    out_channels: int = 8
    rounding: bool = True
    dtype: Any = jnp.float32
    remat: bool = False

    def setup(self):
        self.down1 = UNetDown(self.filters, self.downsample, self.norm,
                              self.dtype, self.remat)
        self.down2 = UNetDown(self.filters, self.downsample, self.norm,
                              self.dtype, self.remat)
        self.shared_bottleneck = UNetBottleneck(
            self.filters, self.downsample, self.norm, self.dtype, self.remat
        )
        self.shared_up = UNetUp(self.filters, self.downsample, self.norm,
                                self.dtype, self.remat)
        self.shared_out = nn.Conv(
            self.out_channels, (1, 1), padding="SAME", name="conv_anatomy",
            dtype=self.dtype,
        )

    def _encode(self, down, x, train):
        h, skips = down(x.astype(self.dtype), train)
        h = self.shared_bottleneck(h, train)
        h = self.shared_up(h, skips, train)
        s = nn.softmax(
            self.shared_out(h).astype(jnp.float32), axis=-1
        ).astype(self.dtype)
        if self.rounding:
            s = round_ste(s)
        return s

    def __call__(self, x1, x2, train: bool = False, pair_groups: int = 1):
        """Encode both modalities with ONE pass through the shared path.

        The reference applies the shared bottleneck/upsample layers twice
        (once per modality, anatomy_encoder.py:32-73); here the private
        down-path outputs are concatenated along batch and the shared path
        runs once on (2B, ...) — half the kernels — with per-modality
        BatchNorm statistics preserved via grouped BN (blocks.BatchNorm).

        pair_groups=K lets the automated-pairing step encode its K
        candidate pairs in this same single pass: x1/x2 arrive as
        K-interleaved stacks (models/base.py::batch_interleave) and every
        BatchNorm keeps per-(pair, modality) statistics — value-identical
        to K separate dual-encoder applications (the reference's loop,
        models/dafnet.py:248-269).
        """
        if x1.shape[0] != x2.shape[0]:
            raise ValueError(
                "DualAnatomyEncoder requires equal batch sizes per modality: "
                f"got {x1.shape[0]} vs {x2.shape[0]}"
            )
        h1, skips1 = self.down1(x1.astype(self.dtype), train, groups=pair_groups)
        h2, skips2 = self.down2(x2.astype(self.dtype), train, groups=pair_groups)
        # interleaved batch-stack (models/base.py): sharding-local under a
        # 'data' mesh; grouped BN keeps per-modality statistics
        h = batch_interleave([h1, h2])
        skips = [batch_interleave([a, b]) for a, b in zip(skips1, skips2)]
        h = self.shared_bottleneck(h, train, groups=2 * pair_groups)
        h = self.shared_up(h, skips, train, groups=2 * pair_groups)
        s = nn.softmax(
            self.shared_out(h).astype(jnp.float32), axis=-1
        ).astype(self.dtype)
        if self.rounding:
            s = round_ste(s)
        s1, s2 = batch_deinterleave(s, 2)
        return s1, s2

    def encode1(self, x, train: bool = False):
        return self._encode(self.down1, x, train)

    def encode2(self, x, train: bool = False):
        return self._encode(self.down2, x, train)
