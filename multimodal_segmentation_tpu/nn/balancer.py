"""Balancer: similarity weights over candidate deformed anatomies.

Reference: model_components/balancer.py:11-38. Computes the Dice overlap of
the target anatomy against each of n_pairs candidates, then a small MLP with
softmax produces the per-pair weights used by the automated-pairing losses.
"""

import jax.numpy as jnp
from flax import linen as nn


def _overlap_dice(a, b, smooth=1e-12):
    """Soft Dice overlap per sample, shape (B, 1) (balancer.py:33-38)."""
    inter = jnp.sum(a * b, axis=(1, 2, 3))
    union = jnp.sum(a, axis=(1, 2, 3)) + jnp.sum(b, axis=(1, 2, 3))
    return ((2.0 * inter + smooth) / (union + smooth))[:, None]


class Balancer(nn.Module):
    n_pairs: int = 3

    @nn.compact
    def __call__(self, s_target, s_candidates, train: bool = False):
        """s_target: (B,H,W,C); s_candidates: list of n_pairs (B,H,W,C)."""
        overlaps = [_overlap_dice(s_target, s) for s in s_candidates]
        x = jnp.concatenate(overlaps, axis=-1)
        x = nn.relu(nn.Dense(5)(x))
        w = nn.Dense(self.n_pairs, name="beta")(x)
        return nn.softmax(w, axis=-1)
