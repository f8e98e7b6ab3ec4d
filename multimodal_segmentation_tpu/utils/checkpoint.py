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
