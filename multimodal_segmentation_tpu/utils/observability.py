"""Observability: loss CSV + plots + qualitative image grids.

Artifact contract matches the reference so downstream tooling works
(SURVEY.md §5.5): <folder>/training.csv (CSVLogger), training_loss.png /
training_discr_loss.png (callbacks/loss_callback.py:27-55), and
training_images/ grids of anatomy channels / segmentations /
reconstructions (callbacks/dafnet_image_callback.py).
"""

import csv
import logging
import os

import numpy as np

log = logging.getLogger("observability")


class LossLogger:
    """CSV + matplotlib loss curves (SaveLoss + CSVLogger parity)."""

    def __init__(self, folder):
        self.folder = folder
        os.makedirs(folder, exist_ok=True)
        self.csv_path = os.path.join(folder, "training.csv")
        self.values = {}
        self._wrote_header = False

    def on_epoch_end(self, epoch, logs):
        for k, v in logs.items():
            self.values.setdefault(k, []).append(float(v))

        keys = sorted(logs.keys())
        write_header = not os.path.exists(self.csv_path)
        with open(self.csv_path, "a", newline="") as f:
            w = csv.writer(f)
            if write_header:
                w.writerow(["epoch"] + keys)
            w.writerow([epoch] + ["%.6f" % float(logs[k]) for k in keys])

        self._plot()

    def _plot(self):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            return

        # generator losses (non-adversarial) — loss_callback.py:27-41
        plt.figure()
        plt.suptitle("Training loss", fontsize=16)
        for k, vals in self.values.items():
            if "dis" in k or "adv" in k:
                continue
            plt.plot(range(len(vals)), vals, label=k)
        plt.xlabel("Epochs")
        plt.ylabel("Loss")
        plt.legend(loc="best", fontsize=6)
        plt.savefig(os.path.join(self.folder, "training_loss.png"))
        plt.close()

        # adversarial/discriminator losses — loss_callback.py:43-54
        plt.figure()
        plt.suptitle("Training loss", fontsize=16)
        for k, vals in self.values.items():
            if not ("dis" in k or "adv" in k):
                continue
            plt.plot(range(len(vals)), vals, label=k)
        plt.xlabel("Epochs")
        plt.ylabel("Loss")
        plt.legend(loc="best", fontsize=6)
        plt.savefig(os.path.join(self.folder, "training_discr_loss.png"))
        plt.close()


def _to_img(x):
    x = np.asarray(x, np.float32)
    lo, hi = x.min(), x.max()
    if hi - lo < 1e-8:
        return np.zeros_like(x)
    return (x - lo) / (hi - lo)


def save_image_grid(path, rows):
    """Save a grid of 2-D arrays: rows = list of lists of (H, W) images."""
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        return
    row_imgs = [np.concatenate([_to_img(c) for c in r], axis=1) for r in rows]
    grid = np.concatenate(row_imgs, axis=0)
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)


class TrainingImageCallback:
    """Per-epoch qualitative grids (DAFNetImageCallback subset:
    anatomy channels, segmentations, reconstructions)."""

    def __init__(self, folder, model, sample_batch):
        self.folder = os.path.join(folder, "training_images")
        os.makedirs(self.folder, exist_ok=True)
        self.model = model
        self.batch = sample_batch

    def on_epoch_end(self, epoch, params, state):
        import jax.numpy as jnp

        x1 = jnp.asarray(self.batch["x1"][:2])
        x2 = jnp.asarray(self.batch["x2"][:2])
        try:
            m = self.model.predict_mask(params, state, 1, "max", [x1, x2])
            m_simple = self.model.predict_mask(params, state, 1, "simple", [x1, x2])
        except Exception as e:  # pragma: no cover
            log.warning("image callback failed: %s", e)
            return
        m = np.asarray(m)
        m_simple = np.asarray(m_simple)
        rows = []
        for i in range(m.shape[0]):
            rows.append(
                [np.asarray(x2)[i, :, :, 0]]
                + [m_simple[i, :, :, j] for j in range(m.shape[-1] - 1)]
            )
            rows.append(
                [np.asarray(x2)[i, :, :, 0]]
                + [m[i, :, :, j] for j in range(m.shape[-1] - 1)]
            )
        save_image_grid(
            os.path.join(self.folder, "segmentations_epoch_%03d.png" % epoch), rows
        )
