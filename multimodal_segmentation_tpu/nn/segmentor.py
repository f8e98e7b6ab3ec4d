"""Segmentor: anatomy channels -> softmax masks (+1 background channel).

Reference: model_components/segmentor.py:9-29.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from multimodal_segmentation_tpu.nn.blocks import BatchNorm, he_normal


class Segmentor(nn.Module):
    num_masks: int = 4
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, s, train: bool = False, groups: int = 1):
        if self.remat and train:
            # save only the input; recompute conv/BN/relu in the backward
            # (HBM-bound step, idle MXU — see blocks.ConvBlock.remat)
            def body(mdl, s):
                return mdl._body(s, train, groups)
            return nn.remat(body)(self, s)
        return self._body(s, train, groups)

    def _body(self, s, train, groups):
        # BN stats/params stay f32 (flax computes low-precision stats in
        # f32); activations stay in compute dtype to avoid f32 HBM traffic.
        # `groups`: the train step applies the segmentor to several anatomy
        # maps in ONE concatenated call; grouped BN (blocks.BatchNorm)
        # keeps the reference's per-invocation batch statistics.
        x = nn.Conv(64, (3, 3), padding="SAME", kernel_init=he_normal,
                    dtype=self.dtype)(s.astype(self.dtype))
        x = BatchNorm(use_running_average=not train, momentum=0.99,
                      epsilon=1e-3, dtype=self.dtype, groups=groups)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), padding="SAME", kernel_init=he_normal,
                    dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not train, momentum=0.99,
                      epsilon=1e-3, dtype=self.dtype, groups=groups)(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_masks + 1, (1, 1), padding="SAME",
                    dtype=self.dtype)(x)
        # softmax in f32: mask probabilities feed Dice/BCE losses
        return nn.softmax(x.astype(jnp.float32), axis=-1)
