"""Training layer: functional train state, jitted steps, SWA, early stopping."""

from multimodal_segmentation_tpu.train.state import TrainState, create_train_state
from multimodal_segmentation_tpu.train.steps import DAFNetSteps, MMSDNetSteps, make_steps
from multimodal_segmentation_tpu.train.swa import swa_update
from multimodal_segmentation_tpu.train.early_stopping import EarlyStopping

__all__ = [
    "TrainState",
    "create_train_state",
    "DAFNetSteps",
    "MMSDNetSteps",
    "make_steps",
    "swa_update",
    "EarlyStopping",
]
