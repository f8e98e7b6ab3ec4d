"""Model assemblies: MMSDNet and DAFNet.

The reference builds composite Keras "trainer" models wiring shared layers
(models/mmsdnet.py, models/dafnet.py); here each model is a set of linen
components plus pure loss functions over (params, state, batch) that the
train steps differentiate. The trainer-model choreography becomes ordinary
code inside one jitted step.
"""

from multimodal_segmentation_tpu.models.base import ComponentSet
from multimodal_segmentation_tpu.models.mmsdnet import MMSDNet
from multimodal_segmentation_tpu.models.dafnet import DAFNet


def build_model(conf):
    """Instantiate the model named by conf.model ('mmsdnet' | 'dafnet');
    the reference resolves the same choice via importlib
    (experiment.py:113-124)."""
    if conf.model == "mmsdnet":
        return MMSDNet(conf)
    if conf.model == "dafnet":
        return DAFNet(conf)
    raise ValueError("Unknown model: %s" % conf.model)


__all__ = ["ComponentSet", "MMSDNet", "DAFNet", "build_model"]
