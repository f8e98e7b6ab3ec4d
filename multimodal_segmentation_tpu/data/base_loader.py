"""Dataset loader abstraction (reference loaders/base_loader.py:10-89).

Implement a Loader subclass and register it in loader_factory to add a
dataset (reference README.md:23).
"""

import os
from abc import ABC, abstractmethod

# reference loaders/base_loader.py:5-7
DATA_CONF = {
    "chaos": os.environ.get("MMSEG_TPU_CHAOS_DIR", "../../data/Chaos/MR"),
}


class Loader(ABC):
    def __init__(self, volumes=None):
        self.volumes = volumes or []
        self.num_masks = 0
        self.input_shape = None
        self.modalities = []

    @abstractmethod
    def splits(self):
        """List of {'training': [...], 'validation': [...], 'test': [...]}."""

    @abstractmethod
    def load_all_modalities_concatenated(self, split, split_type, downsample=1):
        """Returns a MultimodalPairedData for the given split."""

    def get_volumes_for_split(self, split, split_type):
        if split_type == "all":
            return self.volumes
        return self.splits()[split][split_type]
