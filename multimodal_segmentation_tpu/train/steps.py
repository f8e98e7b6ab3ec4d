"""Jitted train steps.

The reference performs ~5 Keras `fit` + 10-16 `predict` host<->device round
trips per batch (SURVEY.md §3.2). Here each batch is ONE compiled XLA
program per path: on-device augmentation -> generator update -> (z-regressor
update for MMSDNet) -> discriminator updates, with Adam states and
BN/spectral state threaded functionally.

Data parallelism: pass a jax.sharding.Mesh; batches are sharded over the
'data' axis, params replicated. Under jit/GSPMD the BN batch statistics are
global-batch statistics (XLA inserts the cross-device reductions), i.e.
sync-BN for free; gradients are averaged by the same mechanism.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_segmentation_tpu.models.base import add_residual
from multimodal_segmentation_tpu.ops.augment import random_rotate_batch
from multimodal_segmentation_tpu.train.state import TrainState, adam


def _batch_shardings(mesh, batch_example):
    data = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda _: data, batch_example)


class _StepsBase:
    def __init__(self, model, conf, mesh=None):
        self.model = model
        self.conf = conf
        self.mesh = mesh
        fused = getattr(conf, "fused_adam", False)
        self.opt_gen = adam(conf.lr, fused)
        self.opt_disc = {}
        for name in model.DISC_COMPONENTS:
            lr = (conf.d_mask_params if name == "d_mask" else conf.d_image_params).lr
            self.opt_disc[name] = adam(lr, fused)

    def _jit(self, fn):
        if self.mesh is not None:
            data = NamedSharding(self.mesh, P("data"))
            # in_shardings None for the TrainState: respect whatever layout
            # it carries (replicated for pure DP; 'model'-sharded wide
            # leaves under tensor parallelism, parallel/sharding.py).
            return jax.jit(
                fn,
                in_shardings=(None, data),
                donate_argnums=(0,),
            )
        return jax.jit(fn, donate_argnums=(0,))

    # ---- shared update pieces ----

    def _gen_update(self, ts, batch, rng, loss_fn):
        gen_params = {k: ts.params[k] for k in self.model.GEN_COMPONENTS}
        disc_params = {k: ts.params[k] for k in self.model.DISC_COMPONENTS}
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_mstate)), grads = grad_fn(
            gen_params, disc_params, ts.model_state, batch, rng
        )
        updates, new_opt = self.opt_gen.update(grads, ts.opt_gen, gen_params)
        new_gen = optax.apply_updates(gen_params, updates)
        ts = ts.replace(
            params={**new_gen, **disc_params},
            model_state=new_mstate,
            opt_gen=new_opt,
        )
        return ts, metrics

    def _disc_update(self, ts, batch, rng, loss_fn, disc_names):
        """Update the discriminators in `disc_names` with their own Adams."""
        d_params = {k: ts.params[k] for k in disc_names}
        other_params = {k: v for k, v in ts.params.items() if k not in disc_names}
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_mstate)), grads = grad_fn(
            d_params, other_params, ts.model_state, batch, rng
        )
        new_params = dict(ts.params)
        new_opt_disc = dict(ts.opt_disc)
        for name in disc_names:
            up, new_opt = self.opt_disc[name].update(
                {name: grads[name]}, ts.opt_disc[name], {name: d_params[name]}
            )
            new_params[name] = optax.apply_updates({name: d_params[name]}, up)[name]
            new_opt_disc[name] = new_opt
        ts = ts.replace(
            params=new_params, opt_disc=new_opt_disc, model_state=new_mstate
        )
        return ts, metrics

    def _augment(self, rng, arrays):
        if self.conf.rotation_range <= 0:
            return arrays
        return random_rotate_batch(rng, arrays, self.conf.rotation_range)


class DAFNetSteps(_StepsBase):
    """One fused step per (supervised|unsupervised) path: generator update +
    mask-discriminator update + image-discriminator update
    (model_executors/dafnet_executor.py:369-387)."""

    def __init__(self, model, conf, mesh=None):
        super().__init__(model, conf, mesh)
        auto = conf.automatedpairing
        self.step_supervised = self._jit(
            functools.partial(self._step, supervised=True, automated=auto)
        )
        self.step_unsupervised = self._jit(
            functools.partial(self._step, supervised=False, automated=auto)
        )

    def _step(self, ts: TrainState, batch, supervised: bool, automated: bool):
        conf = self.conf
        rng = jax.random.fold_in(ts.rng, ts.step)
        r_aug1, r_aug2, r_aug3, r_z, r_gen, r_dm, r_di = jax.random.split(rng, 7)

        # ---- on-device augmentation (base_executor.py:103-110 semantics:
        # identical rotation for images and masks of the same draw) ----
        if automated:
            lab = [batch["x1_pairs"], batch["x2_pairs"], batch["m1"]]
            if supervised:
                lab.append(batch["m2"])
            lab = self._augment(r_aug1, lab)
            batch = dict(batch)
            batch["x1_pairs"], batch["x2_pairs"], batch["m1"] = lab[:3]
            if supervised:
                batch["m2"] = lab[3]
        else:
            lab = [batch["x1"], batch["x2"], batch["m1"]]
            if supervised:
                lab.append(batch["m2"])
            lab = self._augment(r_aug1, lab)
            batch = dict(batch)
            batch["x1"], batch["x2"], batch["m1"] = lab[:3]
            if supervised:
                batch["m2"] = lab[3]

        batch["dm1"], batch["dm2"] = self._augment(
            r_aug2, [batch["dm1"], batch["dm2"]]
        )
        batch["dx1"], batch["dx2"] = self._augment(
            r_aug3, [batch["dx1"], batch["dx2"]]
        )

        # masks get the +background residual channel in-graph
        # (dafnet_executor.py:493-494)
        batch["m1"] = add_residual(batch["m1"])
        if supervised:
            batch["m2"] = add_residual(batch["m2"])

        # sampled z inputs for the Z-regressor branch
        # (dafnet_executor.py:497-499)
        B = batch["dx1"].shape[0]
        rz1, rz2 = jax.random.split(r_z)
        batch["z1"] = jax.random.normal(rz1, (B, conf.num_z))
        batch["z2"] = jax.random.normal(rz2, (B, conf.num_z))

        # ---- generator update ----
        if automated:
            loss_fn = lambda g, d, s, b, r: self.model.gen_loss_automated(
                g, d, s, b, r, supervised
            )
        else:
            loss_fn = lambda g, d, s, b, r: self.model.gen_loss_expert(
                g, d, s, b, r, supervised
            )
        ts, gen_metrics = self._gen_update(ts, batch, r_gen, loss_fn)

        # ---- discriminator updates (use the just-updated generator, like
        # the reference's predict-after-fit ordering) ----
        # D_Mask: TWO sequential Adam steps per batch, one per modality,
        # matching the reference's two `D_Mask_trainer.fit` calls
        # (dafnet_executor.py:534,544). ALL fake pools (masks + images) are
        # computed from ONE shared generator forward on the D-pool images —
        # the reference re-predicts the same components for its mask step
        # (:524-531) and image step (:555-570); the values are identical,
        # so the duplicate UNet forward is pure waste on TPU.
        nm = conf.num_masks
        fake_m1, fake_m2, fake_y1, fake_y2 = self.model.make_fake_pools(
            ts.params, ts.model_state, batch["dx1"], batch["dx2"], r_dm
        )
        ts, dm1 = self._disc_update(
            ts,
            batch,
            r_dm,
            lambda d, o, s, b, r: self.model.d_mask_pair_loss(
                d, o, s, b["dm1"][..., :nm], fake_m1
            ),
            ("d_mask",),
        )
        ts, dm2 = self._disc_update(
            ts,
            batch,
            r_dm,
            lambda d, o, s, b, r: self.model.d_mask_pair_loss(
                d, o, s, b["dm2"][..., :nm], fake_m2
            ),
            ("d_mask",),
        )
        dm_metrics = {"dis_M": (dm1["dis_M"] + dm2["dis_M"]) / 2.0}
        ts, di_metrics = self._disc_update(
            ts,
            batch,
            r_di,
            lambda d, o, s, b, r: self.model.d_image_pair_loss(
                d, o, s, b["dx1"], b["dx2"], fake_y1, fake_y2
            ),
            ("d_image1", "d_image2"),
        )

        metrics = {**gen_metrics, **dm_metrics, **di_metrics}
        ts = ts.replace(step=ts.step + 1)
        return ts, metrics


class MMSDNetSteps(_StepsBase):
    """Per-batch: generator trainer + separately-fit Z-regressor (on detached
    anatomies) + one mask-discriminator update
    (model_executors/mmsdnet_executor.py:242-331)."""

    def __init__(self, model, conf, mesh=None):
        super().__init__(model, conf, mesh)
        self.opt_zreg = adam(conf.lr, getattr(conf, "fused_adam", False))
        self.step_supervised = self._jit(
            functools.partial(self._gen_and_zreg, supervised=True)
        )
        self.step_unsupervised = self._jit(
            functools.partial(self._gen_and_zreg, supervised=False)
        )
        self.step_discriminator = self._jit(self._d_step)

    def _gen_and_zreg(self, ts: TrainState, batch, supervised: bool):
        conf = self.conf
        rng = jax.random.fold_in(ts.rng, ts.step)
        r_aug, r_gen, r_z, r_zreg = jax.random.split(rng, 4)

        lab = [batch["x1"], batch["x2"], batch["m1"]]
        if supervised:
            lab.append(batch["m2"])
        lab = self._augment(r_aug, lab)
        batch = dict(batch)
        batch["x1"], batch["x2"], batch["m1"] = lab[:3]
        if supervised:
            batch["m2"] = lab[3]
        batch["m1"] = add_residual(batch["m1"])
        if supervised:
            batch["m2"] = add_residual(batch["m2"])

        loss_fn = lambda g, d, s, b, r: self.model.gen_loss(
            g, d, s, b, r, supervised
        )
        ts, gen_metrics = self._gen_update(ts, batch, r_gen, loss_fn)

        # ---- Z-regressor on freshly predicted, detached anatomies
        # (mmsdnet_executor.py:267-276) ----
        s_list = self.model.make_z_regressor_anatomies(
            ts.params, ts.model_state, batch["x1"], batch["x2"]
        )
        B = batch["x1"].shape[0]
        z_list = [
            jax.random.normal(jax.random.fold_in(r_z, i), (B, conf.num_z))
            for i in range(6)
        ]
        zreg_params = {k: ts.params[k] for k in self.model.ZREG_COMPONENTS}
        other = {
            k: v for k, v in ts.params.items()
            if k not in self.model.ZREG_COMPONENTS
        }
        grad_fn = jax.value_and_grad(self.model.z_regressor_loss, has_aux=True)
        (_, (z_metrics, _)), grads = grad_fn(
            zreg_params, other, ts.model_state, s_list, z_list, r_zreg
        )
        up, new_opt_z = self.opt_zreg.update(grads, ts.opt_zreg, zreg_params)
        new_zreg = optax.apply_updates(zreg_params, up)
        ts = ts.replace(params={**other, **new_zreg}, opt_zreg=new_opt_z)

        metrics = {**gen_metrics, **z_metrics}
        ts = ts.replace(step=ts.step + 1)
        return ts, metrics

    def _d_step(self, ts: TrainState, batch):
        rng = jax.random.fold_in(ts.rng, ts.step)
        r_aug, r_dm = jax.random.split(rng)
        batch = dict(batch)
        (batch["dm"],) = self._augment(r_aug, [batch["dm"]])
        batch["dx1"], batch["dx2"] = self._augment(
            jax.random.fold_in(r_aug, 1), [batch["dx1"], batch["dx2"]]
        )
        ts, metrics = self._disc_update(
            ts, batch, r_dm, self.model.d_mask_loss, ("d_mask",)
        )
        ts = ts.replace(step=ts.step + 1)
        return ts, metrics


def make_steps(model, conf, mesh=None):
    if conf.model == "mmsdnet":
        return MMSDNetSteps(model, conf, mesh)
    return DAFNetSteps(model, conf, mesh)
