"""Data layer: containers, CHAOS DICOM pipeline, synthetic fixture, batching."""

from multimodal_segmentation_tpu.data.containers import Data, MultimodalPairedData
from multimodal_segmentation_tpu.data.loader_factory import init_loader

__all__ = ["Data", "MultimodalPairedData", "init_loader"]
