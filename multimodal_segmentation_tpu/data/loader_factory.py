"""Loader registry (reference loaders/loader_factory.py:4-10).

'chaos' resolves to the real DICOM loader when pydicom + the data folder
are available, otherwise to the synthetic CHAOS-shaped fixture (with a
warning) so the full pipeline stays runnable in data-less environments.
"""

import logging

log = logging.getLogger("loader_factory")


def init_loader(name, **kwargs):
    if name == "chaos":
        from multimodal_segmentation_tpu.data.chaos import ChaosLoader

        loader = ChaosLoader(**kwargs)
        if loader.available():
            return loader
        log.warning(
            "CHAOS data folder unavailable (%s); using synthetic fixture",
            loader.data_folder,
        )
        from multimodal_segmentation_tpu.data.synthetic import SyntheticChaosLoader

        return SyntheticChaosLoader()
    if name == "synthetic":
        from multimodal_segmentation_tpu.data.synthetic import SyntheticChaosLoader

        return SyntheticChaosLoader(**kwargs)
    if name == "cardiac":
        from multimodal_segmentation_tpu.data.cardiac import CardiacVolumeLoader

        return CardiacVolumeLoader(**kwargs)
    raise ValueError("Unknown loader: %s" % name)
