"""Sharding-friendly batch stacking.

The TPU-native train steps batch what the reference runs as K separate
Keras layer invocations into ONE call on a batch-stacked input. The
stacking ORDER is load-bearing under SPMD: a plain jnp.concatenate along
the batch axis misaligns 'data'-mesh shard boundaries, and GSPMD lowers
the concat/split pairs to hundreds of activation-sized collective-permutes
and all-to-alls per step (round-4 collective audit of the 8-way DP
production DAFNet step: 279 permutes + 99 all-to-alls, ~1.8 GB at full
shape). Interleaved sample-major order keeps the sharded batch dim MAJOR
through the (B, K, ...) <-> (B*K, ...) reshapes, so every device keeps
exactly its own samples' variants and no collective is needed.

Grouped BatchNorm (nn/blocks.py) uses the matching interleaved group
layout, so per-variant statistics stay exact.
"""

import jax.numpy as jnp


def batch_interleave(xs):
    """Batch-axis concatenation in sample-major interleaved order.

    Output row b*K + k is variant k of sample b. Equivalent to
    jnp.concatenate(xs, axis=0) up to row order for every per-sample
    computation (convs, instance/spectral norms, VAE heads, batch-mean
    losses); grouped-BN group k = the rows of variant k.
    """
    if len(xs) == 1:
        return xs[0]
    y = jnp.stack(xs, axis=1)
    return y.reshape((xs[0].shape[0] * len(xs),) + tuple(xs[0].shape[1:]))


def batch_deinterleave(y, K):
    """Inverse of batch_interleave: the K variant arrays."""
    if K == 1:
        return [y]
    B = y.shape[0] // K
    yr = y.reshape((B, K) + tuple(y.shape[1:]))
    return [yr[:, k] for k in range(K)]
