"""Shared component-set machinery for MMSDNet / DAFNet.

Parameters and mutable state are stored per component:
  params = {component_name: param_tree}
  state  = {"batch_stats": {name: tree}, "spectral": {name: tree}}

`apply` routes the right collections to each flax module and collects
batch-stats updates so a training step can thread them functionally.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

GEN_KEY = "gen"


class ComponentSet:
    """A named collection of flax modules with per-component params/state."""

    def __init__(self):
        self.modules: Dict[str, Any] = {}

    def add(self, name, module):
        self.modules[name] = module
        return module

    # -------- init --------

    def init_component(self, name, rng, *example_args, rngs_extra=(), **kw):
        """Initialise one component; returns (params, state_dict)."""
        module = self.modules[name]
        rng_dict = {"params": rng}
        for i, extra in enumerate(rngs_extra):
            rng_dict[extra] = jax.random.fold_in(rng, i + 1)
        variables = module.init(rng_dict, *example_args, **kw)
        params = variables.get("params", {})
        state = {k: v for k, v in variables.items() if k not in ("params", "spectral_loss")}
        return params, state

    # -------- apply --------

    def apply(
        self,
        name,
        params,
        state,
        *args,
        train: bool = False,
        rngs: Optional[dict] = None,
        update_state: bool = False,
        collect_spectral: bool = False,
        method=None,
        **kw,
    ):
        """Apply component `name`.

        Returns (outputs, new_component_state or None, spectral_penalty or None).

        - `train=True` + `update_state=True` makes batch_stats mutable and
          returns the updated stats (the caller threads them into the next
          train state).
        - `collect_spectral=True` additionally makes the 'spectral' and
          'spectral_loss' collections mutable and returns the summed
          penalty with the updated power-iteration state.
        """
        module = self.modules[name]
        comp_state = {}
        for col, trees in state.items():
            if name in trees:
                comp_state[col] = trees[name]
        variables = {"params": params[name], **comp_state}

        mutable = []
        if train and update_state and "batch_stats" in comp_state:
            mutable.append("batch_stats")
        if collect_spectral:
            mutable += ["spectral", "spectral_loss"]

        if mutable:
            out, updates = module.apply(
                variables, *args, train=train, rngs=rngs, mutable=mutable,
                method=method, **kw
            )
        else:
            out = module.apply(
                variables, *args, train=train, rngs=rngs, method=method, **kw
            )
            updates = {}

        new_state = {
            col: updates[col] for col in ("batch_stats", "spectral") if col in updates
        }
        penalty = None
        if "spectral_loss" in updates:
            leaves = jax.tree_util.tree_leaves(updates["spectral_loss"])
            penalty = sum(leaves) if leaves else jnp.zeros(())
        return out, (new_state or None), penalty

    @staticmethod
    def merge_state(state, name, new_comp_state):
        """Merge a component's updated collections back into the global state."""
        if not new_comp_state:
            return state
        out = {k: dict(v) for k, v in state.items()}
        for col, tree in new_comp_state.items():
            out.setdefault(col, {})
            out[col] = dict(out[col])
            out[col][name] = tree
        return out


# sharding-friendly batch stacking (see ops/batching.py for why order
# matters under a 'data' mesh); re-exported here as the models' API
from multimodal_segmentation_tpu.ops.batching import (  # noqa: F401
    batch_deinterleave,
    batch_interleave,
)


def add_residual(masks):
    """Append a background channel = 1 - union(mask channels).

    Matches model_executors/base_executor.py:83-87 for {0,1} masks:
    residual starts at 1 and is zeroed wherever any channel equals 1.
    """
    residual = 1.0 - jnp.max((masks == 1.0).astype(masks.dtype), axis=-1, keepdims=True)
    return jnp.concatenate([masks, residual], axis=-1)


def subsample_pool(rng, variants, B=None):
    """Random fake-pool subsample as a streaming per-slot select.

    The reference builds discriminator fake pools by concatenating K
    generator variants of the B pool images and drawing B rows without
    replacement (np.random.choice on the host, e.g.
    model_executors/dafnet_executor.py:524-543). On TPU a row `jnp.take`
    along the batch axis is an HBM random gather of full images, and under
    a data-parallel mesh GSPMD lowers it to a chain of full-activation
    collective-permutes (measured: 297 permutes up to 113 MB each in the
    8-way DP step). Here each output slot b instead selects uniformly
    among the K variants of THAT slot — one fused elementwise select pass,
    no gather, no cross-device traffic, and each result is still a uniform
    random pool draw. Deliberate deviation: slots are sampled
    independently (stratified by slot) instead of jointly without
    replacement across the K*B rows; the discriminator sees the same
    marginal distribution of fakes.

    Args:
      rng: PRNG key.
      variants: list of K equally-shaped (B, ...) arrays.
      B: unused (kept for call-site clarity); batch comes from variants[0].

    Returns:
      (B, ...) array, slot b = variants[k_b][b] with k_b ~ U{0..K-1}.
    """
    k = len(variants)
    if k == 1:
        return variants[0]
    nb = variants[0].shape[0]
    idx = jax.random.randint(rng, (nb,), 0, k)
    sel_shape = (nb,) + (1,) * (variants[0].ndim - 1)
    out = variants[0]
    for j in range(1, k):
        out = jnp.where((idx == j).reshape(sel_shape), variants[j], out)
    return out
