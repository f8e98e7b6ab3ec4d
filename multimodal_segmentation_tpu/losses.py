"""Loss functions, matching the reference costs.py formula-for-formula.

Every function documents its reference counterpart (file:line). Two
reference quirks are reproduced deliberately because they are load-bearing
for training-dynamics parity:

1. `make_combined_dice_bce` (costs.py:129-136) calls
   `weighted_cross_entropy_loss(y_pred, y_true)` with SWAPPED argument
   names (the function signature is (y_pred, y_true) but it is invoked as
   bce(y_true, y_pred)). The net effect is a penalty of the form
   -mean_px sum_c pred_c * log(true_c + eps) * w_c with class weights
   computed from *predicted* mass. We reproduce that exact math.

2. `make_combined_dice_bce_perbatch` (costs.py:138-143) has the same swap
   and additionally applies a softmax to what ends up being the ground
   truth inside `weighted_cross_entropy_perbatch` (costs.py:88-108).
"""

import jax.numpy as jnp
import numpy as np

LAMBDA_BCE = 0.01  # costs.py:10


def _f32(x):
    """Losses always accumulate in f32 (inputs may be bf16 under mixed
    precision)."""
    return jnp.asarray(x, jnp.float32)


# ---------------- evaluation (numpy, host-side) ----------------

def dice_jax(y_true, y_pred, binarise=False, smooth=1e-12):
    """On-device dice_np: identical math (costs.py:31-41), jnp scalar out.

    Used by per-epoch validation so only the Dice scalar crosses the
    host<->device boundary instead of the full prediction volumes (the
    reference downloads predictions and scores in numpy every epoch,
    dafnet_executor.py:303-367 — a host round-trip the TPU rebuild avoids).
    """
    y_true = _f32(y_true)
    y_pred = _f32(y_pred)[..., 0 : y_true.shape[-1]]
    if binarise:
        y_pred = jnp.round(y_pred)
    inter = jnp.sum(y_true * y_pred, axis=(1, 2, 3))
    union = jnp.sum(y_true, axis=(1, 2, 3)) + jnp.sum(y_pred, axis=(1, 2, 3))
    return jnp.mean((2.0 * inter + smooth) / (union + smooth))


def dice_np(y_true, y_pred, binarise=False, smooth=1e-12):
    """Volume-mean Dice (numpy eval metric, costs.py:31-41)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)[..., 0 : y_true.shape[-1]]
    if binarise:
        y_pred = np.round(y_pred)
    y_int = y_true * y_pred
    return np.mean(
        (2 * np.sum(y_int, axis=(1, 2, 3)) + smooth)
        / (np.sum(y_true, axis=(1, 2, 3)) + np.sum(y_pred, axis=(1, 2, 3)) + smooth)
    )


def dice_np_volume(y_true, y_pred, binarise=False, smooth=1e-12):
    """Whole-volume per-class Dice for a single (D, H, W, C) study.

    Unlike dice_np (the 2-D eval metric, which treats axis 0 as a batch of
    slices and averages per-slice scores — inflating volumetric Dice when
    a class is absent from both truth and prediction on some slices), this
    sums intersections/unions over ALL spatial axes per class, then
    averages over classes present in truth or prediction. Volumes where no
    foreground exists at all score 1.0 iff the prediction is also empty.
    """
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)[..., 0 : y_true.shape[-1]]
    if binarise:
        y_pred = np.round(y_pred)
    spatial = tuple(range(y_true.ndim - 1))
    inter = np.sum(y_true * y_pred, axis=spatial)
    union = np.sum(y_true, axis=spatial) + np.sum(y_pred, axis=spatial)
    present = union > 0
    if not np.any(present):
        return 1.0
    return float(np.mean((2.0 * inter[present]) / (union[present] + smooth)))


# ---------------- segmentation losses (jnp, in-graph) ----------------

def dice_coef_perbatch(y_true, y_pred, eps=1e-12):
    """Per-sample (1 - dice), shape (B,) (costs.py:43-48)."""
    y_true, y_pred = _f32(y_true), _f32(y_pred)
    inter = jnp.sum(y_true * y_pred, axis=(1, 2, 3))
    union = jnp.sum(y_true, axis=(1, 2, 3)) + jnp.sum(y_pred, axis=(1, 2, 3))
    return 1.0 - (2.0 * inter + eps) / (union + eps)


def dice_loss(y_true, y_pred):
    """Mean over batch of per-sample dice loss (costs.py:50-56)."""
    return jnp.mean(dice_coef_perbatch(y_true, y_pred))


def restricted_dice_loss(y_true, y_pred, restrict_chn):
    """Dice on the first `restrict_chn` channels only (costs.py:59-67)."""
    return dice_loss(y_true[..., :restrict_chn], y_pred[..., :restrict_chn])


def _reference_weighted_bce(y_true, y_pred, eps=1e-12):
    """The exact math of costs.py:70-85 *as called* by combined_dice_bce.

    Because of the reference's argument swap, inside the function body the
    parameter slot that is logged is the ground truth and the class-weight
    masses come from the prediction:
      n_c      = sum(pred_c);  w_c = n_tot / (n_c + eps)
      loss     = mean_px( -sum_c pred_c * log(true_c + eps) * w_c )
    """
    num_classes = y_true.shape[-1]
    n = jnp.sum(y_pred.astype(jnp.float32), axis=(0, 1, 2))  # (C,) predicted mass
    n_tot = jnp.sum(n)
    weights = n_tot / (n + eps)
    pred = y_pred.reshape(-1, num_classes)
    true = y_true.reshape(-1, num_classes).astype(jnp.float32)
    wce = -jnp.sum(pred * jnp.log(true + eps) * weights, axis=1)
    return jnp.mean(wce)


def combined_dice_bce(y_true, y_pred, num_classes):
    """dice(first num_classes ch) + 0.01 * swapped-arg weighted BCE
    (costs.py:129-136)."""
    return restricted_dice_loss(y_true, y_pred, num_classes) + LAMBDA_BCE * (
        _reference_weighted_bce(y_true, y_pred)
    )


def _reference_weighted_bce_perbatch(y_true, y_pred, eps=1e-12):
    """Per-sample variant of the swapped-arg weighted BCE
    (costs.py:88-108 as called from costs.py:142).

    With the swap, the softmax is applied to the ground truth and the class
    weights come from predicted mass:
      softmax_t = softmax(true); loss_b = mean_px(-sum_c pred_c *
      log(softmax_t + eps) * w_c)
    """
    shape = y_true.shape
    chn = shape[-1]
    n = jnp.sum(y_pred, axis=(0, 1, 2))
    n_tot = jnp.sum(n)
    weights = n_tot / (n + eps)
    pred = y_pred.reshape(-1, shape[1] * shape[2], chn)
    true = y_true.reshape(-1, shape[1] * shape[2], chn).astype(jnp.float32)
    softmax_t = jnp.exp(true) / jnp.sum(jnp.exp(true), axis=-1, keepdims=True)
    wce = -jnp.sum(pred * jnp.log(softmax_t + eps) * weights, axis=2)
    return jnp.mean(wce, axis=1)


def combined_dice_bce_perbatch(y_true, y_pred, num_classes, eps=1e-12):
    """Per-sample combined loss, shape (B,) (costs.py:138-143)."""
    d = dice_coef_perbatch(
        y_true[..., :num_classes], y_pred[..., :num_classes], eps
    )
    return d + LAMBDA_BCE * _reference_weighted_bce_perbatch(y_true, y_pred)


def similarity_weighted_dice(weights, y_true, y_pred, restrict_chn, eps=1e-5):
    """Dice weighted by per-pair similarity weights (costs.py:111-126)."""
    t = y_true[..., :restrict_chn]
    p = y_pred[..., :restrict_chn]
    inter = jnp.sum(t * p, axis=(1, 2, 3))
    union = jnp.sum(t, axis=(1, 2, 3)) + jnp.sum(p, axis=(1, 2, 3))
    d = (2.0 * inter + eps) / (union + eps)
    return jnp.mean(weights * (1.0 - d))


# ---------------- reconstruction losses ----------------

def mae(y_true, y_pred):
    """Mean absolute error (Keras 'mae')."""
    return jnp.mean(jnp.abs(_f32(y_true) - _f32(y_pred)))


def mae_perbatch(y1, y2):
    """Per-sample MAE over H,W, shape (B, C) (costs.py:24-27)."""
    return jnp.mean(jnp.abs(_f32(y1) - _f32(y2)), axis=(1, 2))


def similarity_weighted_mae(weights, y_true, y_pred):
    """MAE scaled per-sample-per-channel by weights (costs.py:14-21)."""
    w = weights[:, None, None, :]
    return jnp.mean(jnp.abs(y_true - y_pred) * w)


# ---------------- GAN / VAE losses ----------------

def mse(y_true, y_pred):
    """Mean squared error (Keras 'mse'): LSGAN objective."""
    return jnp.mean(jnp.square(_f32(y_true) - _f32(y_pred)))


def lsgan_fool(d_out):
    """Generator-side LSGAN: push D output toward 1 (executor target ones)."""
    return jnp.mean(jnp.square(_f32(d_out) - 1.0))


def lsgan_disc(d_real, d_fake):
    """Discriminator-side LSGAN: real->1, fake->0; losses summed like the
    Keras two-output trainer (models/mmsdnet.py:76)."""
    return jnp.mean(jnp.square(_f32(d_real) - 1.0)) + jnp.mean(
        jnp.square(_f32(d_fake))
    )


def kl_from_stats(z_mean, z_log_var):
    """KL(q(z|x) || N(0, I)) per sample, shape (B, 1) (costs.py:186-189)."""
    kl = -0.5 * jnp.sum(
        1.0 + z_log_var - jnp.square(z_mean) - jnp.exp(z_log_var), axis=-1
    )
    return kl[:, None]


def ypred_loss(y_pred):
    """The reference's pass-through loss for in-graph losses: Keras reduces
    the returned tensor with a mean (costs.py:194-195)."""
    return jnp.mean(y_pred)


def distance_correlation(a, b):
    """Distance correlation between two sample matrices (numpy analysis
    utility; costs.py:198-218 — defined there but unused by training)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    n = a.shape[0]
    if b.shape[0] != n:
        raise ValueError("Number of samples must match")

    def _dist(x):
        d = np.sqrt(
            np.maximum(
                np.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1), 0.0
            )
        )
        return d

    da = _dist(a)
    db = _dist(b)
    A = da - da.mean(axis=0)[None, :] - da.mean(axis=1)[:, None] + da.mean()
    B = db - db.mean(axis=0)[None, :] - db.mean(axis=1)[:, None] + db.mean()
    dcov2_xy = (A * B).sum() / float(n * n)
    dcov2_xx = (A * A).sum() / float(n * n)
    dcov2_yy = (B * B).sum() / float(n * n)
    return np.sqrt(dcov2_xy) / np.sqrt(np.sqrt(dcov2_xx) * np.sqrt(dcov2_yy))
