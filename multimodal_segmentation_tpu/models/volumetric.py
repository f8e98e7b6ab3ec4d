"""Volumetric multi-sequence cardiac segmentation (the 3-D stretch model).

BASELINE.json configs[4]: multi-sequence cardiac LGE+bSSFP+T2 volumes,
"stretch to 3D at pod scale". No reference counterpart exists (the
reference is strictly 2-D single-GPU; SURVEY.md §5.7) — this model is the
framework's scaling demonstration:

* one (B, D, H, W, 3) volume batch is laid out over a
  ('data', 'space') mesh — studies over 'data', the slice axis D over
  'space' — so volumes larger than one chip's HBM train by spatial
  sharding, with XLA's SPMD partitioner inserting the ICI halo exchanges
  for every kd=3 conv (the explicit ppermute halo kernel is
  parallel/halo.py::halo_conv3d, tested bit-exact);
* the supervision math reuses the 2-D framework's loss parity layer
  (losses.combined_dice_bce semantics over channels) by folding D into
  the batch axis, so Dice/wBCE behave identically per slice;
* the whole update (fwd + bwd + Adam) is ONE jitted XLA program, like
  the 2-D steps (train/steps.py).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_segmentation_tpu.losses import (
    combined_dice_bce,
    dice_np_volume,
)
from multimodal_segmentation_tpu.nn.unet3d import UNet3D


def _fold_depth(x):
    b, d = x.shape[0], x.shape[1]
    return x.reshape((b * d,) + x.shape[2:])


class Cardiac3DSegmenter:
    """3-D UNet over multi-sequence volumes + single-program train step."""

    def __init__(self, conf, mesh: Optional[Mesh] = None):
        self.conf = conf
        self.mesh = mesh
        dtype = jnp.bfloat16 if conf.compute_dtype == "bfloat16" else jnp.float32
        self.net = UNet3D(
            filters=conf.filters3d,
            downsample=conf.downsample3d,
            out_channels=conf.num_masks + 1,  # +background like segmentor.py
            dtype=dtype,
        )
        self.opt = optax.adam(conf.lr)
        self._make_step()

    # ---- setup ----

    def init(self, rng):
        D, H, W, S = self.conf.volume_shape
        x = jnp.zeros((1, D, H, W, S), jnp.float32)
        params = self.net.init(rng, x, train=True)
        opt_state = self.opt.init(params)
        return params, opt_state

    def _volume_sharding(self):
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P("data", "space"))

    def shard_batch(self, batch):
        """Device-put (volumes, masks) with (N->data, D->space) layout."""
        if self.mesh is None:
            return batch
        s = self._volume_sharding()
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), batch)

    # ---- training ----

    def loss_fn(self, params, volumes, masks, train=True):
        """Dice + weighted-BCE over classes (+background channel), per
        slice — the 2-D supervision contract (losses.py parity layer)
        lifted to volumes by folding D into the batch."""
        if self.mesh is not None:
            s = self._volume_sharding()
            volumes = jax.lax.with_sharding_constraint(volumes, s)
            masks = jax.lax.with_sharding_constraint(masks, s)
        pred = self.net.apply(params, volumes, train=train)
        bg = 1.0 - jnp.clip(jnp.sum(masks, axis=-1, keepdims=True), 0.0, 1.0)
        target = jnp.concatenate([masks, bg], axis=-1)
        loss = combined_dice_bce(
            _fold_depth(target), _fold_depth(pred), self.conf.num_masks + 1
        )
        return loss, pred

    def _make_step(self):
        def step(params, opt_state, volumes, masks, rng):
            if self.conf.rotation_range > 0:
                from multimodal_segmentation_tpu.ops.augment import (
                    random_rotate_volumes,
                )

                volumes, masks = random_rotate_volumes(
                    rng, volumes, masks, self.conf.rotation_range
                )
            (loss, _), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, volumes, masks
            )
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if self.mesh is not None:
            data = self._volume_sharding()
            self._step = jax.jit(
                step,
                in_shardings=(None, None, data, data, None),
                donate_argnums=(0, 1),
            )
        else:
            self._step = jax.jit(step, donate_argnums=(0, 1))
        self._step_count = 0

    def step(self, params, opt_state, volumes, masks, rng=None):
        if rng is None:
            rng = jax.random.fold_in(jax.random.PRNGKey(0), self._step_count)
            self._step_count += 1
        return self._step(params, opt_state, volumes, masks, rng)

    # ---- inference / evaluation ----

    @functools.partial(jax.jit, static_argnums=0)
    def _predict(self, params, volumes):
        return self.net.apply(params, volumes, train=False)

    def predict(self, params, volumes):
        if self.mesh is not None:
            # Inference batches can be any size (evaluate() tails, test()
            # predicts single studies), so shard only the depth axis —
            # P('data','space') would require B % n_data == 0.
            s = NamedSharding(self.mesh, P(None, "space"))
            volumes = jax.device_put(volumes, s)
        return self._predict(params, volumes)

    def evaluate(self, params, volumes, masks, batch=2):
        """Per-study whole-volume binarised Dice (foreground classes)."""
        scores = []
        for i in range(0, volumes.shape[0], batch):
            pred = np.asarray(self.predict(params, volumes[i : i + batch]))
            for j in range(pred.shape[0]):
                scores.append(
                    dice_np_volume(
                        masks[i + j], pred[j][..., : self.conf.num_masks],
                        binarise=True,
                    )
                )
        return float(np.mean(scores))


class Cardiac3DExecutor:
    """CLI executor for the volumetric preset: same artifact contract as
    the 2-D executors (training.csv, models/*.npz, test_results_*/
    results.csv) so downstream tooling reads both families alike."""

    def __init__(self, conf, mesh=None):
        self.conf = conf
        self.mesh = mesh
        self.model = Cardiac3DSegmenter(conf, mesh=mesh)
        self.params = None

    def train(self):
        import csv
        import os

        conf = self.conf
        _, params, history = train_cardiac3d(
            conf, mesh=self.mesh, epochs=conf.epochs, seed=conf.seed
        )
        self.params = params
        os.makedirs(conf.folder, exist_ok=True)
        with open(os.path.join(conf.folder, "training.csv"), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["epoch", "loss", "val_dice"])
            w.writeheader()
            w.writerows(history)
        flat = {
            "/".join(map(str, path)): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        }
        os.makedirs(os.path.join(conf.folder, "models"), exist_ok=True)
        np.savez(os.path.join(conf.folder, "models", "cardiac3d.npz"), **flat)

    def test(self):
        import csv
        import os

        from multimodal_segmentation_tpu.data.loader_factory import init_loader

        conf = self.conf
        if self.params is None:
            # --test without train(): restore from the saved npz by key
            path = os.path.join(conf.folder, "models", "cardiac3d.npz")
            saved = np.load(path)
            init, _ = self.model.init(jax.random.PRNGKey(conf.seed))
            paths_leaves = jax.tree_util.tree_leaves_with_path(init)
            leaves = [
                jnp.asarray(saved["/".join(map(str, p))]) for p, _ in paths_leaves
            ]
            self.params = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(init), leaves
            )
        loader = init_loader("cardiac", shape=conf.volume_shape[:3])
        xs, ys = loader.load_volumes(conf.split, "test")
        vols = loader.get_volumes_for_split(conf.split, "test")
        outdir = os.path.join(conf.folder, "test_results_cardiac")
        os.makedirs(outdir, exist_ok=True)
        rows = []
        for i, vid in enumerate(vols):
            pred = np.asarray(self.model.predict(self.params, xs[i : i + 1]))[0]
            d = dice_np_volume(ys[i], pred[..., : conf.num_masks], binarise=True)
            per = [
                dice_np_volume(
                    ys[i][..., k : k + 1],
                    pred[..., k : k + 1],
                    binarise=True,
                )
                for k in range(conf.num_masks)
            ]
            rows.append({"volume": vid, "dice": d, **{
                "dice_c%d" % k: per[k] for k in range(conf.num_masks)}})
        with open(os.path.join(outdir, "results.csv"), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        mean = float(np.mean([r["dice"] for r in rows]))
        print("cardiac3d - Dice score: %.3f" % mean)
        return mean


def train_cardiac3d(conf, mesh=None, epochs=None, seed=0, log_every=0):
    """Minimal volumetric training loop over the cardiac loader."""
    from multimodal_segmentation_tpu.data.loader_factory import init_loader

    loader = init_loader("cardiac", shape=conf.volume_shape[:3])
    xs, ys = loader.load_volumes(conf.split, "training")
    xv, yv = loader.load_volumes(conf.split, "validation")

    model = Cardiac3DSegmenter(conf, mesh=mesh)
    params, opt_state = model.init(jax.random.PRNGKey(seed))

    B = conf.batch_size
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    history = []
    step_i = 0
    for epoch in range(epochs or conf.epochs):
        order = rng.permutation(xs.shape[0])
        n = (xs.shape[0] // B) * B
        losses = []
        for i in range(0, n, B):
            idx = order[i : i + B]
            vb, mb = model.shard_batch(
                (jnp.asarray(xs[idx]), jnp.asarray(ys[idx]))
            )
            params, opt_state, loss = model.step(
                params, opt_state, vb, mb, jax.random.fold_in(key, step_i)
            )
            step_i += 1
            losses.append(loss)
        val_dice = model.evaluate(params, xv, yv, batch=B)
        history.append(
            {"epoch": epoch, "loss": float(np.mean(jax.device_get(losses))),
             "val_dice": val_dice}
        )
        if log_every and epoch % log_every == 0:
            print(history[-1])
    return model, params, history
