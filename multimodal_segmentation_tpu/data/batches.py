"""Host-side batch streams feeding the jitted steps.

Replaces the reference's keras ImageDataGenerator zip choreography
(model_executors/base_executor.py:37-78). Augmentation happens on-device
(ops/augment.py), so these streams only shuffle and cycle. Batches are
always full-size (wraparound at epoch end) so the train step compiles once;
the reference instead truncated the last batch (align_batches,
base_executor.py:112-118) — a shape-stability deviation documented here.
"""

import numpy as np


class BatchStream:
    """Infinite shuffled batch iterator over a dict of equal-length arrays."""

    def __init__(self, arrays, batch_size, seed=0, shuffle=True):
        self.arrays = {k: np.asarray(v, np.float32) for k, v in arrays.items()}
        lengths = {k: len(v) for k, v in self.arrays.items()}
        assert len(set(lengths.values())) == 1, lengths
        self.n = next(iter(lengths.values()))
        assert self.n > 0, "empty batch stream"
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self._order = np.arange(self.n)
        self._pos = self.n  # force reshuffle on first draw

    def __iter__(self):
        return self

    def __next__(self):
        idx = []
        need = self.batch_size
        while need > 0:
            if self._pos >= self.n:
                if self.shuffle:
                    self.rng.shuffle(self._order)
                self._pos = 0
            take = min(need, self.n - self._pos)
            idx.append(self._order[self._pos : self._pos + take])
            self._pos += take
            need -= take
        idx = np.concatenate(idx)
        return {k: v[idx] for k, v in self.arrays.items()}
