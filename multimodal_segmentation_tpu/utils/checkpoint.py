"""Checkpoint / resume via Orbax.

Replaces the reference's per-component Keras weight files written from SWA
clone models (model_executors/dafnet_executor.py:286-301, SURVEY.md §5.4)
with one atomic checkpoint of the full train-state pytree: all component
params, both/all optimizer states, BN stats, spectral vectors, the SWA
running average, the PRNG key and the epoch counter. Component-addressable
restore is preserved because params are keyed by component name.

This is also the preemption-recovery path (TPU VMs are preemptible):
`latest_epoch` + `restore` give auto-resume, a capability with no
reference counterpart (SURVEY.md §5.3).
"""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

log = logging.getLogger("checkpoint")


class CheckpointManager:
    def __init__(self, folder, max_to_keep=3):
        self.directory = os.path.abspath(os.path.join(folder, "checkpoints"))
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, epoch, train_state):
        self._mgr.save(
            epoch, args=ocp.args.StandardSave(jax.device_get(train_state))
        )
        self._mgr.wait_until_finished()

    def latest_epoch(self):
        return self._mgr.latest_step()

    def restore(self, epoch, abstract_state):
        """Restore into the structure of `abstract_state` (a concrete
        template train state)."""
        return self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(abstract_state)
        )

    def save_component_weights(self, folder, params, postfix=""):
        """Also export per-component .npz weight files mirroring the
        reference's models/<Component> layout (dafnet_executor.py:292-301)."""
        os.makedirs(folder, exist_ok=True)
        for name, tree in params.items():
            flat = {}
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                key = "/".join(str(getattr(p, "key", p)) for p in path)
                flat[key] = np.asarray(leaf)
            np.savez_compressed(
                os.path.join(folder, "%s%s.npz" % (name, postfix)), **flat
            )

    def load_component_weights(self, folder, params, components=None,
                               postfix=""):
        """Inverse of save_component_weights: restore any subset of
        components' params from <folder>/<Component>.npz into a params
        dict keyed by component name. Components without an .npz file are
        left untouched — the reference loads each sub-model's weights
        independently and tolerates absent files the same way
        (models/dafnet.py:54-73).

        Returns (new_params, loaded_component_names).
        """
        new = dict(params)
        names = list(params.keys()) if components is None else list(components)
        loaded = []
        for name in names:
            path = os.path.join(folder, "%s%s.npz" % (name, postfix))
            if not os.path.exists(path):
                continue
            with np.load(path) as saved:
                tree = params[name]
                paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(
                    tree
                )
                leaves = []
                for p, leaf in paths_leaves:
                    key = "/".join(str(getattr(q, "key", q)) for q in p)
                    if key not in saved:
                        raise KeyError(
                            "%s: missing array %r (file has %s)"
                            % (path, key, sorted(saved.keys()))
                        )
                    arr = saved[key]
                    if tuple(arr.shape) != tuple(np.shape(leaf)):
                        raise ValueError(
                            "%s: %r shape %s does not match model shape %s"
                            % (path, key, arr.shape, np.shape(leaf))
                        )
                    leaves.append(jnp.asarray(arr, np.asarray(leaf).dtype))
            new[name] = jax.tree_util.tree_unflatten(treedef, leaves)
            loaded.append(name)
        if loaded:
            log.info("Loaded component weights: %s", ", ".join(loaded))
        return new, loaded
