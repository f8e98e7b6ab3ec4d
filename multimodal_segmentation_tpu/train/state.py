"""Functional train state: one pytree carrying everything the reference kept
in 10 Keras models + hidden K.variables + SWA callback attributes
(SURVEY.md §5.4): params of all components, BN running stats, spectral
power-iteration vectors, every optimizer state, the SWA running average and
the PRNG key.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    epoch: jnp.ndarray
    params: Dict[str, Any]
    model_state: Dict[str, Any]          # {'batch_stats': ..., 'spectral': ...}
    opt_gen: Any
    opt_disc: Dict[str, Any]             # one Adam state per discriminator
    opt_zreg: Any                        # MMSDNet's separate Z-regressor Adam
    swa_params: Dict[str, Any]           # SWA running average of all params
    rng: jax.Array


def adam(lr):
    """Keras 2.1.6 Adam defaults: beta1 0.9, beta2 0.999, epsilon 1e-7
    (epsilon=None -> K.epsilon()); same bias correction as optax.adam."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-7)


def create_train_state(model, conf, rng):
    """Initialise params/state/optimizers for either model family."""
    init_rng, state_rng = jax.random.split(rng)
    params, model_state = model.init(init_rng)

    gen_params = {k: params[k] for k in model.GEN_COMPONENTS}
    opt_gen = adam(conf.lr).init(gen_params)

    opt_disc = {}
    for name in model.DISC_COMPONENTS:
        lr = (conf.d_mask_params if name == "d_mask" else conf.d_image_params).lr
        opt_disc[name] = adam(lr).init({name: params[name]})

    opt_zreg = None
    if hasattr(model, "ZREG_COMPONENTS"):
        zreg_params = {k: params[k] for k in model.ZREG_COMPONENTS}
        opt_zreg = adam(conf.lr).init(zreg_params)

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_gen=opt_gen,
        opt_disc=opt_disc,
        opt_zreg=opt_zreg,
        # real copies: swa_params must not alias params (buffer donation)
        swa_params=jax.tree_util.tree_map(jnp.copy, params),
        rng=state_rng,
    )
