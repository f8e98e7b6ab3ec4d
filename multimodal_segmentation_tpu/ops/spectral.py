"""Spectral-norm regularisation penalty via power iteration.

Replaces the reference's stateful Keras regularizer (layers/spectralnorm.py:
199-246). The reference keeps the power-iteration vector `u` as a hidden
K.variable captured at graph build; here `u` is explicit state threaded
through the train step (stored in the discriminator's 'spectral' variable
collection), which both fits JAX's functional model and warm-starts the
power iteration across steps.

Penalty (reference layers/spectralnorm.py:229-239):
  x = reshape(W, (-1, out_ch)); 3 power iterations estimate sigma_max;
  penalty = alpha * mean(|stop_grad(x / sigma) - x|).
Gradients flow only through the raw `x` term (the normalised target is
stop-gradiented), exactly as in the reference.
"""

import jax
import jax.numpy as jnp


def spectral_penalty(w, u, alpha=10.0, iters=3, eps=1e-12):
    """Compute the spectral regularisation penalty for one weight tensor.

    Args:
      w: weight array; flattened to (prod(leading), out_ch) like the
        reference's K.reshape(x, (-1, x_shape[-1])).
      u: (dim, 1) power-iteration state, dim = prod of leading dims of w.
      alpha: penalty weight (reference uses 10).
      iters: number of power iterations (reference uses 3).

    Returns:
      (penalty, new_u): scalar penalty and the updated (stop-gradiented)
      power-iteration vector to persist for the next step.
    """
    x = w.reshape(-1, w.shape[-1])
    u = jax.lax.stop_gradient(u)
    for _ in range(iters):
        wtu = x.T @ u
        v = wtu / jnp.sqrt(jnp.sum(jnp.square(wtu)) + eps)
        wv = x @ v
        u = wv / jnp.sqrt(jnp.sum(jnp.square(wv)) + eps)
    sigma = (u.T @ x @ v)[0, 0]
    target = jax.lax.stop_gradient(x / sigma)
    penalty = alpha * jnp.mean(jnp.abs(target - x))
    return penalty, jax.lax.stop_gradient(u)
