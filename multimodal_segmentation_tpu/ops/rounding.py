"""Straight-through rounding.

Binarises the softmax-ed anatomy channels while letting gradients pass
through unchanged. Replaces the reference's tf.py_func + gradient-override
implementation (reference: layers/rounding.py:8-42) with a jax.custom_vjp —
the forward is a pure `jnp.round` that XLA fuses into the surrounding
program (the reference implementation forced a host round-trip through
numpy on every call).
"""

import jax
import jax.numpy as jnp


def round_ste(x, use_pallas=False):
    """Round to the nearest integer; identity gradient (straight-through).

    The jnp custom-vjp path is the default everywhere: a bare `jnp.round`
    fuses into the surrounding elementwise chains, whereas a Pallas call is
    an opaque custom-call — a fusion barrier that forces both its input and
    output anatomy tensors through HBM, which is pure overhead for this
    bandwidth-bound step. The numerically identical tiled Pallas kernel
    (ops/pallas_kernels.py::round_ste_pallas) stays available behind
    `use_pallas=True` as the template for VMEM-resident fusions in the 3-D
    large-volume regime (PERF.md).
    """
    if use_pallas and jax.default_backend() == "tpu":
        from multimodal_segmentation_tpu.ops.pallas_kernels import round_ste_pallas

        return round_ste_pallas(x)
    return _round_ste_jnp(x)


@jax.custom_vjp
def _round_ste_jnp(x):
    return jnp.round(x)


def _round_ste_fwd(x):
    return jnp.round(x), None


def _round_ste_bwd(_, g):
    # Identity gradient, matching the reference override
    # (layers/rounding.py:40-42: grad * 1).
    return (g,)


_round_ste_jnp.defvjp(_round_ste_fwd, _round_ste_bwd)
