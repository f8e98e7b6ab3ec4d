"""Functional train state: one pytree carrying everything the reference kept
in 10 Keras models + hidden K.variables + SWA callback attributes
(SURVEY.md §5.4): params of all components, BN running stats, spectral
power-iteration vectors, every optimizer state, the SWA running average and
the PRNG key.
"""

from typing import Any, Dict

import jax
import jax.flatten_util
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


def adam(lr, fused: bool = False):
    """Keras 2.1.6 Adam defaults: beta1 0.9, beta2 0.999, epsilon 1e-7
    (epsilon=None -> K.epsilon()); same bias correction as optax.adam.

    fused=True runs the mathematically identical update over a single
    flattened moment vector (flat_adam below): one fused elementwise pass
    per step instead of one small fusion chain per parameter leaf (226
    leaves for DAFNet). Pure-DP runs keep optimizer state replicated
    either way; tensor parallelism wants fused=False so the per-leaf
    moments can mirror the parameter shardings
    (parallel/sharding.py::tp_shard_train_state).
    """
    if fused:
        return flat_adam(lr, b1=0.9, b2=0.999, eps=1e-7)
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-7)


@struct.dataclass
class FlatAdamState:
    count: jnp.ndarray   # int32 scalar step count
    m: jnp.ndarray       # first moment, flattened over all leaves
    v: jnp.ndarray       # second moment, flattened over all leaves


def flat_adam(lr, b1=0.9, b2=0.999, eps=1e-7):
    """Adam over the ravelled parameter vector.

    Same math as optax.adam (scale_by_adam with eps_root=0 followed by
    -lr scaling), but the moment updates and the bias-corrected step run
    as full-vector elementwise ops on one contiguous buffer: XLA emits a
    handful of large VPU fusions instead of ~10 tiny ops per leaf. The
    per-leaf update views are slices of the flat step vector and fuse
    into optax.apply_updates' adds.
    """

    def init(params):
        flat, _ = jax.flatten_util.ravel_pytree(params)
        return FlatAdamState(
            count=jnp.zeros((), jnp.int32),
            m=jnp.zeros_like(flat),
            v=jnp.zeros_like(flat),
        )

    def update(updates, state, params=None):
        del params
        flat_g, unravel = jax.flatten_util.ravel_pytree(updates)
        count = state.count + 1
        m = b1 * state.m + (1.0 - b1) * flat_g
        v = b2 * state.v + (1.0 - b2) * jnp.square(flat_g)
        t = count.astype(jnp.float32)
        m_hat = m / (1.0 - b1**t)
        v_hat = v / (1.0 - b2**t)
        step = (-lr) * m_hat / (jnp.sqrt(v_hat) + eps)
        return unravel(step), FlatAdamState(count=count, m=m, v=v)

    return optax.GradientTransformation(init, update)


def create_train_state(model, conf, rng):
    """Initialise params/state/optimizers for either model family."""
    init_rng, state_rng = jax.random.split(rng)
    params, model_state = model.init(init_rng)

    fused = getattr(conf, "fused_adam", False)
    gen_params = {k: params[k] for k in model.GEN_COMPONENTS}
    opt_gen = adam(conf.lr, fused).init(gen_params)

    opt_disc = {}
    for name in model.DISC_COMPONENTS:
        lr = (conf.d_mask_params if name == "d_mask" else conf.d_image_params).lr
        opt_disc[name] = adam(lr, fused).init({name: params[name]})

    opt_zreg = None
    if hasattr(model, "ZREG_COMPONENTS"):
        zreg_params = {k: params[k] for k in model.ZREG_COMPONENTS}
        opt_zreg = adam(conf.lr, fused).init(zreg_params)

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
