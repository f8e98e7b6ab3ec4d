"""Model components as functional flax.linen modules.

Each module mirrors one sub-network of the reference (model_components/*,
models/unet.py, models/discriminator.py, layers/*) but is a pure function of
(params, state, inputs) so the whole composite training step compiles into a
single XLA program.
"""

from multimodal_segmentation_tpu.nn.blocks import ConvBlock, InstanceNorm, Norm, UpsampleBlock
from multimodal_segmentation_tpu.nn.unet import UNet
from multimodal_segmentation_tpu.nn.anatomy_encoder import AnatomyEncoder, DualAnatomyEncoder
from multimodal_segmentation_tpu.nn.modality_encoder import ModalityEncoder
from multimodal_segmentation_tpu.nn.segmentor import Segmentor
from multimodal_segmentation_tpu.nn.decoder import Decoder, FiLMDecoder, SPADEDecoder
from multimodal_segmentation_tpu.nn.discriminator import Discriminator
from multimodal_segmentation_tpu.nn.fuser import AnatomyFuser, LocNet
from multimodal_segmentation_tpu.nn.balancer import Balancer

__all__ = [
    "ConvBlock",
    "InstanceNorm",
    "Norm",
    "UpsampleBlock",
    "UNet",
    "AnatomyEncoder",
    "DualAnatomyEncoder",
    "ModalityEncoder",
    "Segmentor",
    "Decoder",
    "FiLMDecoder",
    "SPADEDecoder",
    "Discriminator",
    "AnatomyFuser",
    "LocNet",
    "Balancer",
]
