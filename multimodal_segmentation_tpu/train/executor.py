"""Training executors: epoch/batch loops around the jitted steps.

Reference: model_executors/mmsdnet_executor.py and dafnet_executor.py. The
loop structure (labelled/unlabelled paths per l_mix, discriminator batches
from separate unlabelled pools, per-epoch validation + SWA + early stop +
artifact logging) is preserved; the per-batch GPU choreography is replaced
by the fused XLA steps in train/steps.py.
"""

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_segmentation_tpu import losses
from multimodal_segmentation_tpu.data.batches import BatchStream
from multimodal_segmentation_tpu.data.loader_factory import init_loader
from multimodal_segmentation_tpu.data.prefetch import prefetch_to_device
from multimodal_segmentation_tpu.train.early_stopping import EarlyStopping
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps
from multimodal_segmentation_tpu.train.swa import swa_update
from multimodal_segmentation_tpu.utils.checkpoint import CheckpointManager
from multimodal_segmentation_tpu.utils.observability import (
    LossLogger,
    TrainingImageCallback,
)

log = logging.getLogger("executor")


class Executor:
    """Shared scaffolding (reference model_executors/base_executor.py:14)."""

    def __init__(self, conf, model, mesh=None):
        self.conf = conf
        self.model = model
        self.mesh = mesh
        loader_kwargs = {}
        if conf.dataset_name == "synthetic":
            loader_kwargs["hw"] = conf.input_hw
        self.loader = init_loader(conf.dataset_name, **loader_kwargs)
        self.loader.modalities = list(conf.modality)
        self.steps = make_steps(model, conf, mesh)
        self.ckpt = CheckpointManager(conf.folder)
        self.data = None
        self.ul_data = None
        self.data_len = 0
        self._predict_mask = jax.jit(
            model.predict_mask, static_argnums=(2, 3)
        )
        # on-device eval Dice: only the scalar crosses the relay each epoch
        self._dice_bin = jax.jit(
            lambda m, y: losses.dice_jax(m, y, binarise=True)
        )
        self._val_arrays = None

    # ---------------------------------------------------------------- data

    def _load_labelled(self):
        """l_mix volume-level labelled subset
        (mmsdnet_executor.py:52-66, dafnet_executor.py:79-100)."""
        conf = self.conf
        if conf.l_mix == 0:
            return None
        data = self.loader.load_all_modalities_concatenated(
            conf.split, "training", conf.image_downsample
        )
        data.crop(conf.input_hw)
        data.sample(int(np.round(conf.l_mix * data.num_volumes)), seed=conf.seed)
        if getattr(conf, "randomise", False):
            data.randomise_pairs(conf.n_pairs - 1, seed=conf.seed)
        elif getattr(conf, "automatedpairing", False):
            data.expand_pairs(conf.n_pairs - 1, 0, neighborhood=conf.n_pairs)
            data.expand_pairs(conf.n_pairs - 1, 1, neighborhood=conf.n_pairs)
        self.data = data
        self.data_len = data.size()
        return data

    def _load_unlabelled(self):
        """Unlabelled complement of the labelled volumes
        (dafnet_executor.py:102-151)."""
        conf = self.conf
        if conf.l_mix == 1:
            return None
        ul = self.loader.load_all_modalities_concatenated(
            conf.split, "training", conf.image_downsample
        )
        ul.crop(conf.input_hw)
        if getattr(conf, "randomise", False):
            ul.randomise_pairs(length=conf.n_pairs - 1)
        elif getattr(conf, "automatedpairing", False):
            ul.expand_pairs(conf.n_pairs - 1, 0, neighborhood=conf.n_pairs)
            ul.expand_pairs(conf.n_pairs - 1, 1, neighborhood=conf.n_pairs)
        if conf.l_mix > 0:
            num_lb = int(np.round(conf.l_mix * ul.num_volumes))
            np.random.seed(conf.seed)
            lb_vols = set(
                np.random.choice(ul.volumes(), size=num_lb, replace=False).tolist()
            )
            ul.filter_volumes([v for v in ul.volumes() if v not in lb_vols])
        self.ul_data = ul
        if self.data is None or ul.size() > self.data_len:
            self.data_len = ul.size()
        return ul

    def _disc_mask_pool(self):
        """Real-mask pool for the mask discriminator
        (dafnet_executor.py:161-176)."""
        masks = []
        if self.data is not None:
            masks += [self.data.get_masks_modi(0), self.data.get_masks_modi(1)]
        if self.ul_data is not None:
            masks.append(self.ul_data.get_masks_modi(0))
        return np.concatenate(masks, axis=0)

    def _disc_image_pool(self):
        """Per-modality image pools for the image discriminators / fake
        generation (dafnet_executor.py:178-184: the full training split)."""
        full = self.loader.load_all_modalities_concatenated(
            self.conf.split, "training", self.conf.image_downsample
        )
        full.crop(self.conf.input_hw)
        return full.get_images_modi(0), full.get_images_modi(1)

    def init_train_data(self):
        conf = self.conf
        self._load_labelled()
        self._load_unlabelled()

        auto = getattr(conf, "automatedpairing", False)
        if self.data is not None:
            if auto:
                lab = {
                    "x1_pairs": self.data.get_images_modi(0),
                    "x2_pairs": self.data.get_images_modi(1),
                    "m1": self.data.get_masks_modi(0),
                    "m2": self.data.get_masks_modi(1),
                }
            else:
                lab = {
                    "x1": self.data.get_images_modi(0),
                    "x2": self.data.get_images_modi(1),
                    "m1": self.data.get_masks_modi(0),
                    "m2": self.data.get_masks_modi(1),
                }
            self.gen_labelled = BatchStream(lab, conf.batch_size, conf.seed)
        else:
            self.gen_labelled = None

        if self.ul_data is not None:
            if auto:
                ul = {
                    "x1_pairs": self.ul_data.get_images_modi(0),
                    "x2_pairs": self.ul_data.get_images_modi(1),
                    "m1": self.ul_data.get_masks_modi(0),
                }
            else:
                ul = {
                    "x1": self.ul_data.get_images_modi(0),
                    "x2": self.ul_data.get_images_modi(1),
                    "m1": self.ul_data.get_masks_modi(0),
                }
            self.gen_unlabelled = BatchStream(ul, conf.batch_size, conf.seed + 1)
        else:
            self.gen_unlabelled = None

        self.disc_masks = BatchStream(
            {"m": self._disc_mask_pool()}, conf.batch_size, conf.seed + 2
        )
        dx1, dx2 = self._disc_image_pool()
        self.disc_images = BatchStream(
            {"dx1": dx1, "dx2": dx2}, conf.batch_size, conf.seed + 3
        )

        self.batches = int(np.ceil(self.data_len / conf.batch_size))
        if getattr(conf, "steps_per_epoch", None):
            self.batches = min(self.batches, conf.steps_per_epoch)

        # Double-buffered host->HBM feed (SURVEY.md §7): assembled batches
        # are device_put (sharded over 'data' under a mesh) ahead of
        # consumption so the H2D copy rides under the previous step's
        # compute instead of serialising with it.
        sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            sharding = NamedSharding(self.mesh, PartitionSpec("data"))
        self.batch_iter = prefetch_to_device(
            self._assembled_batches(), size=2, sharding=sharding
        )

    def _assembled_batches(self):
        """Infinite iterator of fully-assembled per-step batch dicts,
        keyed by path ('sup' / 'unsup' / 'disc')."""
        raise NotImplementedError

    # ------------------------------------------------------------ training

    def create_state(self):
        ts = create_train_state(
            self.model, self.conf, jax.random.PRNGKey(self.conf.seed)
        )
        start_epoch = 0
        latest = self.ckpt.latest_epoch()
        if latest is not None:
            log.info("Resuming from checkpoint at epoch %d", latest)
            ts = self.ckpt.restore(latest, jax.device_get(ts))
            ts = jax.tree_util.tree_map(jnp.asarray, ts)
            start_epoch = latest + 1
        else:
            # No full checkpoint: restore any per-component .npz weights
            # (reference loads each sub-model independently at build,
            # models/dafnet.py:54-73). The exported npz hold the
            # eval/SWA-clone weights (dafnet_executor.py:286-301), so they
            # seed both the live params and the SWA average.
            params, loaded = self.ckpt.load_component_weights(
                os.path.join(self.conf.folder, "models"), ts.params
            )
            if loaded:
                ts = ts.replace(
                    params=params,
                    swa_params=jax.tree_util.tree_map(jnp.copy, params),
                )
        return ts, start_epoch

    def train(self):
        conf = self.conf
        os.makedirs(conf.folder, exist_ok=True)
        self.init_train_data()
        ts, start_epoch = self.create_state()

        loss_logger = LossLogger(conf.folder)
        sample_batch = (
            self.gen_labelled.arrays
            if self.gen_labelled is not None
            else self.gen_unlabelled.arrays
        )
        if "x1" not in sample_batch and "x1_pairs" in sample_batch:
            # Automated pairing: the reference constructs its image callback
            # in every mode and slices pair 0 — the expertly-paired slice
            # (dafnet_image_callback.py:75-76; expand_pairs puts it first,
            # MultimodalPairedData.py:116-119).
            sample_batch = dict(sample_batch)
            sample_batch["x1"] = sample_batch["x1_pairs"][..., 0:1]
            sample_batch["x2"] = sample_batch["x2_pairs"][..., 0:1]
        img_cb = TrainingImageCallback(conf.folder, self.model, sample_batch)
        es = EarlyStopping(
            "val_loss_mod2_fused", conf.es_min_delta, conf.es_patience
        )
        if start_epoch > 0:
            # preemption-resume: rebuild the monitor's best/wait counters
            # from the previous run's epoch log so patience does not
            # restart at the resume epoch (found by the round-3 kill+resume
            # drill; see EarlyStopping.replay_csv)
            es.replay_csv(os.path.join(conf.folder, "training.csv"), start_epoch)

        prof_start, prof_end = getattr(conf, "profile_epochs", (0, 0))
        for epoch in range(start_epoch, conf.epochs):
            t0 = time.time()
            ts = ts.replace(epoch=jnp.asarray(epoch, jnp.int32))
            epoch_metrics = {}

            # jax.profiler trace window (SURVEY.md §5.1: the reference has
            # no tracing at all; this writes a TensorBoard-compatible trace)
            if prof_end and epoch == prof_start:
                jax.profiler.start_trace(os.path.join(conf.folder, "profile"))

            for _ in range(self.batches):
                ts = self.train_batch(ts, epoch_metrics)

            if prof_end and epoch + 1 == prof_end:
                jax.block_until_ready(ts.params)
                jax.profiler.stop_trace()

            ts = self.on_epoch_end(ts, epoch)

            logs = {k: float(np.mean(v)) for k, v in epoch_metrics.items()}
            logs.update(self.validate(ts))
            loss_logger.on_epoch_end(epoch, logs)
            log.info(
                "Epoch %d/%d (%.1fs): %s",
                epoch,
                conf.epochs,
                time.time() - t0,
                ", ".join("%s=%.4f" % (k, v) for k, v in sorted(logs.items())),
            )

            # per-epoch test_error.txt: "epoch, -dice" appended each epoch
            # (callbacks/image_callback.py:64-66, SaveImage). The reference
            # records the negated mean Dice of the displayed predictions;
            # here the tracked validation Dice plays that role.
            if "val_loss" in logs:
                with open(
                    os.path.join(conf.folder, "test_error.txt"), "a+"
                ) as f:
                    f.write("%d, %.3f\n" % (epoch, logs["val_loss"] - 1.0))

            img_every = max(1, getattr(conf, "image_callback_interval", 1))
            if img_cb is not None and epoch % img_every == 0:
                img_cb.on_epoch_end(
                    epoch, *self.params_for_eval(ts)
                )
            # checkpoint_interval > 1 trades a bounded re-run window for
            # save cost (full-state saves device_get ~MBs over the relay):
            # a preemption can lose up to interval-1 epochs, which the
            # resume re-runs. training.csv is append-only, so those re-run
            # epochs appear twice in the file; EarlyStopping.replay_csv
            # dedupes by epoch when rebuilding its counters.
            ckpt_every = max(1, getattr(conf, "checkpoint_interval", 1))
            comp_every = max(1, getattr(conf, "component_save_interval", 1))
            stopping = es.update(epoch, logs)
            last = epoch + 1 == conf.epochs
            if epoch % ckpt_every == 0 or stopping or last:
                self.ckpt.save(epoch, ts)
            if epoch % comp_every == 0 or stopping or epoch + 1 == conf.epochs:
                self.ckpt.save_component_weights(
                    os.path.join(conf.folder, "models"),
                    self.params_for_eval(ts)[0],
                )

            if stopping:
                log.info("Finished training from early stopping criterion")
                ts = self.on_train_end(ts)
                self.ckpt.save(epoch + 1, ts)
                break

        self.final_state = ts
        return ts

    def train_batch(self, ts, epoch_metrics):
        raise NotImplementedError

    def on_epoch_end(self, ts, epoch):
        return ts

    def on_train_end(self, ts):
        return ts

    def params_for_eval(self, ts):
        """(params, model_state) used for validation/inference."""
        return ts.params, ts.model_state

    def _collect(self, epoch_metrics, metrics):
        for k, v in metrics.items():
            epoch_metrics.setdefault(k, []).append(float(v))

    # ---------------------------------------------------------- validation

    def _validation_arrays(self):
        """Device-resident validation set; the split is fixed, so the
        upload happens once (re-randomised each epoch under
        conf.randomise, matching dafnet_executor.py:317)."""
        conf = self.conf
        randomise = getattr(conf, "randomise", False)
        if self._val_arrays is not None and not randomise:
            return self._val_arrays
        valid = self.loader.load_all_modalities_concatenated(
            conf.split, "validation", conf.image_downsample
        )
        if randomise:
            valid.randomise_pairs(length=conf.n_pairs - 1)
        valid.crop(conf.input_hw)
        arrays = (
            jnp.asarray(valid.get_images_modi(0), jnp.float32),
            jnp.asarray(valid.get_images_modi(1), jnp.float32),
            jnp.asarray(valid.get_masks_modi(0), jnp.float32),
            jnp.asarray(valid.get_masks_modi(1), jnp.float32),
        )
        self._val_arrays = arrays
        return arrays

    def _validation_masks(self, params, state):
        images0, images1, masks0, masks1 = self._validation_arrays()
        preds = {}
        for t in ("simple", "def", "max"):
            preds[("mod2", t)] = self._predict_mask(
                params, state, 1, t, [images0, images1]
            )
            preds[("mod1", t)] = self._predict_mask(
                params, state, 0, t, [images0, images1]
            )
        return masks0, masks1, preds

    def validate(self, ts):
        """DAFNet-style validation losses (dafnet_executor.py:303-354);
        MMSDNetExecutor overrides with its 4-metric variant. Dice is
        computed on device (losses.dice_jax); only scalars reach the host."""
        params, state = self.params_for_eval(ts)
        masks0, masks1, p = self._validation_masks(params, state)
        d = lambda m, y: 1 - float(self._dice_bin(m, y))
        logs = {
            "val_loss_mod1": d(masks0, p[("mod1", "simple")]),
            "val_loss_mod2": d(masks1, p[("mod2", "simple")]),
            "val_loss_mod2_mod1def": d(masks1, p[("mod2", "def")]),
            "val_loss_mod1_mod2def": d(masks0, p[("mod1", "def")]),
            "val_loss_mod2_fused": d(masks1, p[("mod2", "max")]),
            "val_loss_mod1_fused": d(masks0, p[("mod1", "max")]),
        }
        logs["val_loss"] = float(
            np.mean(
                [
                    logs["val_loss_mod1"],
                    logs["val_loss_mod2"],
                    logs["val_loss_mod2_mod1def"],
                    logs["val_loss_mod2_fused"],
                ]
            )
        )
        return logs

    # -------------------------------------------------------------- testing

    def test(self):
        from multimodal_segmentation_tpu.eval.tester import ModelTester

        params, state = self.params_for_eval(self.final_state)
        ModelTester(self.model, self.conf, params, state).run()


class DAFNetExecutor(Executor):
    """DAFNet loop: per batch, each active path (supervised / unsupervised)
    runs its fused step (generator + both discriminator updates); SWA over
    every component from epoch 40; validation on the SWA average
    (dafnet_executor.py:212-284,303-367)."""

    def _assembled_batches(self):
        conf = self.conf
        while True:
            out = {}
            if conf.l_mix > 0:
                batch = dict(next(self.gen_labelled))
                dm1 = next(self.disc_masks)["m"]
                dm2 = next(self.disc_masks)["m"]
                batch.update(next(self.disc_images))
                batch["dm1"], batch["dm2"] = dm1, dm2
                out["sup"] = batch
            if conf.l_mix < 1:
                batch = dict(next(self.gen_unlabelled))
                dm1 = next(self.disc_masks)["m"]
                dm2 = next(self.disc_masks)["m"]
                batch.update(next(self.disc_images))
                batch["dm1"], batch["dm2"] = dm1, dm2
                out["unsup"] = batch
            yield out

    def train_batch(self, ts, epoch_metrics):
        batch = next(self.batch_iter)
        if "sup" in batch:
            ts, metrics = self.steps.step_supervised(ts, batch["sup"])
            self._collect(epoch_metrics, metrics)
        if "unsup" in batch:
            ts, metrics = self.steps.step_unsupervised(ts, batch["unsup"])
            self._collect(epoch_metrics, metrics)
        return ts

    def on_epoch_end(self, ts, epoch):
        new_swa = swa_update(
            ts.swa_params, ts.params, jnp.asarray(epoch), self.conf.swa_start_epoch
        )
        return ts.replace(swa_params=new_swa)

    def on_train_end(self, ts):
        """Swap live weights to the SWA average (dafnet_executor.py:271-283)."""
        return ts.replace(params=ts.swa_params)

    def params_for_eval(self, ts):
        # validation/checkpointing use SWA clone weights
        # (dafnet_executor.py:286-301,319-335)
        return ts.swa_params, ts.model_state

    def validate(self, ts):
        logs = super().validate(ts)
        if getattr(self.conf, "automatedpairing", False):
            logs.update(self._validate_balancer_weights(ts))
        return logs

    def _validate_balancer_weights(self, ts):
        """Mean balancer weight per candidate pair on the validation set
        (dafnet_executor.py:356-367). Uses live weights like the reference."""
        conf = self.conf
        params, state = ts.params, ts.model_state
        valid = self.loader.load_all_modalities_concatenated(
            conf.split, "validation", conf.image_downsample
        )
        valid.crop(conf.input_hw)
        valid.expand_pairs(conf.n_pairs - 1, 0, neighborhood=conf.n_pairs)
        images0 = valid.get_images_modi(0)
        images1 = jnp.asarray(valid.get_images_modi(1), jnp.float32)

        s1_list = []
        for i in range(images0.shape[-1]):
            xi = jnp.asarray(images0[..., i : i + 1], jnp.float32)
            s1, _, _ = self.model.components.apply(
                "enc_anatomy", params, state, xi, method="encode1"
            )
            s1_list.append(s1)
        s2, _, _ = self.model.components.apply(
            "enc_anatomy", params, state, images1, method="encode2"
        )
        (w, _, _) = self.model.components.apply(
            "balancer", params, state, s2, s1_list
        )
        w = np.asarray(w)
        return {
            "val_weight_%d" % j: float(w[:, j].mean()) for j in range(conf.n_pairs)
        }


class MMSDNetExecutor(Executor):
    """MMSDNet loop: generator(+Z-regressor) steps for the active paths,
    then one mask-discriminator step per batch; validation on live weights
    (mmsdnet_executor.py:159-236)."""

    def _assembled_batches(self):
        conf = self.conf
        while True:
            out = {}
            if conf.l_mix > 0:
                out["sup"] = dict(next(self.gen_labelled))
            if conf.l_mix < 1:
                out["unsup"] = dict(next(self.gen_unlabelled))
            out["disc"] = {
                "dm": next(self.disc_masks)["m"], **next(self.disc_images)
            }
            yield out

    def train_batch(self, ts, epoch_metrics):
        batch = next(self.batch_iter)
        if "sup" in batch:
            ts, metrics = self.steps.step_supervised(ts, batch["sup"])
            self._collect(epoch_metrics, metrics)
        if "unsup" in batch:
            ts, metrics = self.steps.step_unsupervised(ts, batch["unsup"])
            self._collect(epoch_metrics, metrics)
        ts, metrics = self.steps.step_discriminator(ts, batch["disc"])
        self._collect(epoch_metrics, metrics)
        return ts

    def validate(self, ts):
        """4-metric validation (mmsdnet_executor.py:210-236), Dice on
        device."""
        params, state = self.params_for_eval(ts)
        masks0, masks1, p = self._validation_masks(params, state)
        d = lambda m, y: 1 - float(self._dice_bin(m, y))
        logs = {
            "val_loss_mod1": d(masks0, p[("mod1", "simple")]),
            "val_loss_mod2": d(masks1, p[("mod2", "simple")]),
            "val_loss_mod2_s1def": d(masks1, p[("mod2", "def")]),
            "val_loss_mod2_fused": d(masks1, p[("mod2", "max")]),
        }
        logs["val_loss"] = float(np.mean(list(logs.values())))
        return logs


def make_executor(conf, model, mesh=None):
    if conf.model == "mmsdnet":
        return MMSDNetExecutor(conf, model, mesh)
    return DAFNetExecutor(conf, model, mesh)
