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
    """Per-epoch qualitative diagnostics of the disentanglement.

    Parity with callbacks/dafnet_image_callback.py:19-282: segmentation
    grids (plot_segmentations :142), anatomy-channel grids + z mean/var
    CSVs (plot_latent_representation :95-130), reconstruction + z/s
    ablation grids (plot_reconstructions :237, get_rec_image :263), and
    discriminator-output histograms (plot_discriminator_outputs :193).
    """

    def __init__(self, folder, model, sample_batch):
        self.folder = os.path.join(folder, "training_images")
        os.makedirs(self.folder, exist_ok=True)
        self.model = model
        self.batch = sample_batch

    def _anatomies(self, params, state, x1, x2):
        m = self.model
        if hasattr(m, "encode_anatomies"):  # DAFNet dual encoder
            s1, s2, _ = m.encode_anatomies(params, state, x1, x2)
        else:  # MMSDNet private encoders
            s1, _ = m.encode_anatomy(params, state, 0, x1)
            s2, _ = m.encode_anatomy(params, state, 1, x2)
        return s1, s2

    def on_epoch_end(self, epoch, params, state):
        import jax
        import jax.numpy as jnp

        x1 = jnp.asarray(self.batch["x1"][:2])
        x2 = jnp.asarray(self.batch["x2"][:2])
        try:
            self._plot_segmentations(epoch, params, state, x1, x2)
            self._plot_latent_representation(epoch, params, state, x1, x2)
            self._plot_reconstructions(epoch, params, state, x1, x2)
            self._plot_discriminator_outputs(epoch, params, state, x1, x2)
            self._plot_epoch_grid(epoch, params, state)
        except Exception as e:  # pragma: no cover
            log.warning("image callback failed: %s", e)

    def _plot_epoch_grid(self, epoch, params, state):
        """Intensity-augmented training-batch segmentation grid
        (callbacks/image_callback.py:69-123, SaveEpochImages): the displayed
        batch gets a random brightness/contrast jitter
        (utils/image_utils.py:100-110) before prediction; rows are the
        images beside the value-scaled true and predicted mask overlays,
        written under <folder>/training/."""
        import jax
        import jax.numpy as jnp

        from multimodal_segmentation_tpu.ops.augment import (
            random_brightness_contrast,
        )

        folder = os.path.join(os.path.dirname(self.folder), "training")
        os.makedirs(folder, exist_ok=True)

        n = min(4, len(self.batch["x1"]))  # image_callback.py:101 caps at 4
        x1 = jnp.asarray(self.batch["x1"][:n])
        x2 = jnp.asarray(self.batch["x2"][:n])
        x1 = random_brightness_contrast(
            jax.random.PRNGKey(epoch), x1, brightness=0.01, contrast=0.01
        )
        x2 = random_brightness_contrast(
            jax.random.PRNGKey(epoch + 1), x2, brightness=0.01, contrast=0.01
        )
        y = np.asarray(self.model.predict_mask(params, state, 1, "simple", [x1, x2]))
        m = np.asarray(self.batch.get("m2", self.batch["m1"])[:n])
        nm = m.shape[-1]
        # value-scaled mask overlays (save_multiimage_segmentation :109-112)
        m_img = sum(m[..., j] * (j + 1) / nm for j in range(nm))
        y_img = sum(y[..., j] * (j + 1) / nm for j in range(nm))
        rows = [
            [np.asarray(x2)[i, :, :, 0], m_img[i], y_img[i]] for i in range(n)
        ]
        save_image_grid(
            os.path.join(folder, "segmentations_epoch_%d.png" % epoch), rows
        )

    def _plot_segmentations(self, epoch, params, state, x1, x2):
        m = np.asarray(self.model.predict_mask(params, state, 1, "max", [x1, x2]))
        m_simple = np.asarray(
            self.model.predict_mask(params, state, 1, "simple", [x1, x2])
        )
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

    def _plot_latent_representation(self, epoch, params, state, x1, x2):
        """Anatomy-channel grids + z mean/var CSVs
        (dafnet_image_callback.py:95-130)."""
        import jax

        s1, s2 = self._anatomies(params, state, x1, x2)
        s1, s2 = np.asarray(s1), np.asarray(s2)
        rows = []
        for img, s in ((np.asarray(x1), s1), (np.asarray(x2), s2)):
            for i in range(s.shape[0]):
                rows.append(
                    [img[i, :, :, 0]] + [s[i, :, :, c] for c in range(s.shape[-1])]
                )
        save_image_grid(
            os.path.join(self.folder, "anatomies_epoch_%03d.png" % epoch), rows
        )

        import jax.random as jr

        _, mu1, lv1, _ = self.model.encode_modality(
            params, state, jax.numpy.asarray(s1), x1, jr.PRNGKey(0), sample=False
        )
        _, mu2, lv2, _ = self.model.encode_modality(
            params, state, jax.numpy.asarray(s2), x2, jr.PRNGKey(0), sample=False
        )
        for name, mu, lv in (("mod1", mu1, lv1), ("mod2", mu2, lv2)):
            with open(
                os.path.join(self.folder, "z_means_%s.csv" % name), "a"
            ) as f:
                f.write(
                    "%d,%s\n"
                    % (epoch, ",".join("%.5f" % v for v in np.asarray(mu).mean(0)))
                )
            with open(
                os.path.join(self.folder, "z_vars_%s.csv" % name), "a"
            ) as f:
                f.write(
                    "%d,%s\n"
                    % (
                        epoch,
                        ",".join(
                            "%.5f" % v for v in np.exp(np.asarray(lv)).mean(0)
                        ),
                    )
                )

    def _plot_reconstructions(self, epoch, params, state, x1, x2):
        """Reconstruction + z-ablation grid (dafnet_image_callback.py:237-282):
        rows of [x, dec(s, z), dec(s, 0), dec(s, z~N(0,1))]."""
        import jax
        import jax.numpy as jnp

        s1, s2 = self._anatomies(params, state, x1, x2)
        rows = []
        for img, s in ((x1, s1), (x2, s2)):
            z, _, _, _ = self.model.encode_modality(
                params, state, s, img, jax.random.PRNGKey(1)
            )
            rec = self.model.decode(params, state, s, z)
            rec0 = self.model.decode(params, state, s, jnp.zeros_like(z))
            zr = jax.random.normal(jax.random.PRNGKey(2), z.shape)
            recr = self.model.decode(params, state, s, zr)
            for i in range(np.asarray(img).shape[0]):
                rows.append(
                    [
                        np.asarray(img)[i, :, :, 0],
                        np.asarray(rec)[i, :, :, 0],
                        np.asarray(rec0)[i, :, :, 0],
                        np.asarray(recr)[i, :, :, 0],
                    ]
                )
        save_image_grid(
            os.path.join(self.folder, "reconstructions_epoch_%03d.png" % epoch),
            rows,
        )

    def _disc_score(self, params, state, name, x):
        """Mean D output; DAFNet discriminators are addressed by name."""
        if self.model.__class__.__name__ == "DAFNet":
            out = self.model.discriminate(params, state, name, x)
        else:
            out = self.model.discriminate(params, state, x)
        return np.asarray(out)

    def _plot_discriminator_outputs(self, epoch, params, state, x1, x2):
        """Real-vs-fake discriminator diagnostics
        (dafnet_image_callback.py:193-235): a 4x2 figure of real masks
        beside predicted masks, each titled with the mean D_Mask score,
        plus (DAFNet) real/fake output histograms for both image
        discriminators on reconstructions."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            return
        import jax
        import jax.numpy as jnp

        if not (hasattr(self.model, "discriminate") and "d_mask" in params):
            return

        s1, s2 = self._anatomies(params, state, x1, x2)
        pred_m, _ = self.model.segment(
            params, state, jnp.concatenate([s1, s2], axis=0)
        )
        pred_m = np.asarray(pred_m)
        nm = pred_m.shape[-1] - 1
        real_m = np.asarray(self.batch.get("m2", self.batch["m1"]))[..., :nm]
        pred_m = pred_m[..., :nm]

        n = min(4, len(real_m), len(pred_m))
        fig = plt.figure()
        for i in range(n):
            d_real = self._disc_score(
                params, state, "d_mask", jnp.asarray(real_m[i : i + 1])
            ).mean()
            d_fake = self._disc_score(
                params, state, "d_mask", jnp.asarray(pred_m[i : i + 1])
            ).mean()
            plt.subplot(n, 2, 2 * i + 1)
            plt.imshow(
                np.concatenate([real_m[i, :, :, c] for c in range(nm)], axis=1),
                cmap="gray",
            )
            plt.xticks([]); plt.yticks([])
            plt.title("Pred: %.3f" % d_real, fontsize=8)
            plt.subplot(n, 2, 2 * i + 2)
            plt.imshow(
                np.concatenate([pred_m[i, :, :, c] for c in range(nm)], axis=1),
                cmap="gray",
            )
            plt.xticks([]); plt.yticks([])
            plt.title("Pred: %.3f" % d_fake, fontsize=8)
        plt.tight_layout()
        plt.savefig(
            os.path.join(self.folder, "discriminator_epoch_%03d.png" % epoch)
        )
        plt.close(fig)

        # image discriminators (DAFNet only): real images vs reconstructions
        if "d_image1" not in params:
            return
        z1, _, _, _ = self.model.encode_modality(
            params, state, s1, x1, jax.random.PRNGKey(3)
        )
        z2, _, _, _ = self.model.encode_modality(
            params, state, s2, x2, jax.random.PRNGKey(4)
        )
        rec1 = self.model.decode(params, state, s1, z1)
        rec2 = self.model.decode(params, state, s2, z2)
        fig = plt.figure()
        for j, (name, real, fake) in enumerate(
            (("d_image1", x1, rec1), ("d_image2", x2, rec2))
        ):
            d_real = self._disc_score(params, state, name, real).ravel()
            d_fake = self._disc_score(params, state, name, fake).ravel()
            plt.subplot(1, 2, j + 1)
            plt.hist(d_real, bins=20, alpha=0.6, label="real")
            plt.hist(d_fake, bins=20, alpha=0.6, label="fake")
            plt.title(name, fontsize=8)
            plt.legend(fontsize=6)
        plt.tight_layout()
        plt.savefig(
            os.path.join(
                self.folder, "discriminator_image_epoch_%03d.png" % epoch
            )
        )
        plt.close(fig)
