"""Stochastic Weight Averaging as a pytree running mean.

Reference: callbacks/swa.py:27-38 — while epoch <= swa_epoch the average
tracks the live weights; afterwards
  swa <- (swa * (epoch - swa_epoch) + live) / (epoch - swa_epoch + 1).
Applied uniformly to every component (the reference instantiates one SWA
callback per sub-model, model_executors/dafnet_executor.py:41-54).
"""

import jax
import jax.numpy as jnp


def swa_update(swa_params, params, epoch, swa_epoch):
    """Jit-safe SWA update (epoch may be a traced scalar)."""
    n = (epoch - swa_epoch).astype(jnp.float32)

    def blend(avg, live):
        new_avg = (avg * n + live) / (n + 1.0)
        return jnp.where(n > 0, new_avg, live)

    return jax.tree_util.tree_map(blend, swa_params, params)
