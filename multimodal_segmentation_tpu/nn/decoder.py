"""Decoders: render an image from (anatomy s, modality z).

Reference: model_components/decoder.py (FiLM path :44-65, SPADE path :67-81)
plus layers/film.py and layers/spade.py.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_segmentation_tpu.nn.blocks import (
    InstanceNorm,
    glorot_normal,
    leaky_relu,
    upsample2x,
)


class FiLMLayer(nn.Module):
    """Residual FiLM block (decoder.py:44-55 + layers/film.py:26-36)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, z):
        l1 = nn.Conv(8, (3, 3), padding="SAME", dtype=self.dtype)(h)
        l1 = leaky_relu(l1)

        l2 = nn.Conv(8, (3, 3), padding="SAME", dtype=self.dtype)(l1)
        gamma = leaky_relu(nn.Dense(8, dtype=self.dtype)(z))
        beta = leaky_relu(nn.Dense(8, dtype=self.dtype)(z))
        l2 = l2 * gamma[:, None, None, :] + beta[:, None, None, :]
        l2 = leaky_relu(l2)
        return l1 + l2


class FiLMDecoder(nn.Module):
    """conv8 + 4 residual FiLM layers + 1x1 tanh conv (decoder.py:57-65, :28)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, s, z, train: bool = False):
        s = s.astype(self.dtype)
        z = z.astype(self.dtype)
        h = leaky_relu(nn.Conv(8, (3, 3), padding="SAME", dtype=self.dtype)(s))
        for _ in range(4):
            h = FiLMLayer(self.dtype)(h, z)
        return nn.tanh(
            nn.Conv(1, (1, 1), padding="SAME", kernel_init=glorot_normal)(
                h.astype(jnp.float32)
            )
        )


def _resize_nearest(x, hw):
    """Nearest-neighbour resize to (h, w) (layers/spade.py:36-38)."""
    h, w = hw
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="nearest")


class SPADEUnit(nn.Module):
    """One SPADE conditioning: param-free instance norm, then spatial
    gamma/beta predicted from the (resized) anatomy (layers/spade.py:26-33)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, s, h):
        h_norm = InstanceNorm(use_scale=False, use_bias=False)(h)
        a = _resize_nearest(s, h.shape[1:3]).astype(self.dtype)
        a = nn.relu(nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype)(a))
        gamma = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(a)
        beta = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(a)
        return h_norm * (1.0 + gamma) + beta


class SPADEBlock(nn.Module):
    """Residual SPADE block with learned shortcut when fin != fout
    (layers/spade.py:7-23)."""

    fin: int
    fout: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, s, h):
        fmiddle = min(self.fin, self.fout)
        x = SPADEUnit(self.fin, self.dtype)(s, h)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Conv(fmiddle, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = SPADEUnit(fmiddle, self.dtype)(s, x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Conv(self.fout, (3, 3), padding="SAME", dtype=self.dtype)(x)
        if self.fin != self.fout:
            sc = SPADEUnit(self.fin, self.dtype)(s, h)
            sc = nn.Conv(self.fout, (1, 1), padding="SAME", use_bias=False,
                         dtype=self.dtype)(sc)
        else:
            sc = h
        return sc + x


class SPADEDecoder(nn.Module):
    """z -> Dense -> (H/32, W/32, 128) -> 6 SPADE blocks / 5 upsamplings
    (decoder.py:67-81)."""

    input_hw: tuple = (192, 192)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, s, z, train: bool = False):
        s = s.astype(self.dtype)
        z = z.astype(self.dtype)
        h0, w0 = self.input_hw[0] // 32, self.input_hw[1] // 32
        h = nn.Dense(h0 * w0 * 128, dtype=self.dtype)(z)
        h = h.reshape(-1, h0, w0, 128)
        h = SPADEBlock(128, 128, self.dtype)(s, h)
        h = upsample2x(h)
        h = SPADEBlock(128, 128, self.dtype)(s, h)
        h = upsample2x(h)
        h = SPADEBlock(128, 128, self.dtype)(s, h)
        h = upsample2x(h)
        h = SPADEBlock(128, 64, self.dtype)(s, h)
        h = upsample2x(h)
        h = SPADEBlock(64, 32, self.dtype)(s, h)
        h = upsample2x(h)
        h = SPADEBlock(32, 16, self.dtype)(s, h)
        return nn.tanh(
            nn.Conv(1, (1, 1), padding="SAME", kernel_init=glorot_normal)(
                h.astype(jnp.float32)
            )
        )


class Decoder(nn.Module):
    """Dispatch on decoder_type ('film' | 'spade') like decoder.py:12-33."""

    decoder_type: str = "film"
    input_hw: tuple = (192, 192)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, s, z, train: bool = False):
        if self.decoder_type == "film":
            return FiLMDecoder(self.dtype)(s, z, train)
        if self.decoder_type == "spade":
            return SPADEDecoder(self.input_hw, self.dtype)(s, z, train)
        raise ValueError("Unknown decoder_type: %s" % self.decoder_type)
