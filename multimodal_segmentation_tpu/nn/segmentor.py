"""Segmentor: anatomy channels -> softmax masks (+1 background channel).

Reference: model_components/segmentor.py:9-29.
"""

from flax import linen as nn

from multimodal_segmentation_tpu.nn.blocks import he_normal


class Segmentor(nn.Module):
    num_masks: int = 4

    @nn.compact
    def __call__(self, s, train: bool = False):
        x = nn.Conv(64, (3, 3), padding="SAME", kernel_init=he_normal)(s)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), padding="SAME", kernel_init=he_normal)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_masks + 1, (1, 1), padding="SAME")(x)
        return nn.softmax(x, axis=-1)
