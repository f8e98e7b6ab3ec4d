"""Early stopping with Keras semantics.

Reference: model_executors/dafnet_executor.py:222 —
EarlyStopping('val_loss_mod2_fused', min_delta=0.01, patience=60), min mode.
"""


class EarlyStopping:
    def __init__(self, monitor="val_loss_mod2_fused", min_delta=0.01, patience=60):
        self.monitor = monitor
        self.min_delta = abs(min_delta)
        self.patience = patience
        self.best = float("inf")
        self.wait = 0
        self.stopped_epoch = 0

    def update(self, epoch, logs) -> bool:
        """Returns True when training should stop (Keras on_epoch_end logic)."""
        current = logs.get(self.monitor)
        if current is None:
            return False
        if current < self.best - self.min_delta:
            self.best = current
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.stopped_epoch = epoch
                return True
        return False
