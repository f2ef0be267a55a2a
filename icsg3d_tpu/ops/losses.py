"""Loss functions matching the reference's Keras losses.

All losses take float32 logits/targets and reduce per-sample first, so
data-parallel gradient averaging over a mesh is a plain psum/mean
regardless of per-device batch size.

One documented numerical deviation: binary_crossentropy_from_logits uses
the stable log-sum-exp form instead of Keras's clipped-probability BCE,
so at saturation (|logit| > ~16) the per-element loss keeps growing with
a live gradient where Keras plateaus at ~16.1 with zero gradient — the
stable form is strictly better-behaved; everything else matches Keras
numerics including the epsilon clipping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

KERAS_EPSILON = 1e-7  # K.epsilon()


def weighted_categorical_crossentropy(logits, labels_onehot, class_weights):
    """Per-voxel class-weighted CCE, mean over spatial dims.

    Matches weighted_categorical_crossentropy (unet/unet.py:196-221): probs
    renormalized, clipped to [eps, 1-eps], loss = -sum(y*log(p)*w) per
    voxel, mean over (D,H,W).  Returns (B,) per-sample losses.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = jnp.clip(probs, KERAS_EPSILON, 1.0 - KERAS_EPSILON)
    w = jnp.asarray(class_weights, dtype=jnp.float32)
    per_voxel = -jnp.sum(labels_onehot * jnp.log(probs) * w, axis=-1)
    return jnp.mean(per_voxel, axis=tuple(range(1, per_voxel.ndim)))


def weighted_categorical_crossentropy_from_labels(logits, labels, class_weights):
    """Integer-label form of weighted_categorical_crossentropy: the one-hot
    contraction collapses to a gather of the true class's log-prob and
    weight, so the (B, d^3, C) one-hot never exists.  Same clipping/mean
    semantics; returns (B,)."""
    if jnp.shape(class_weights)[0] != logits.shape[-1]:
        # the gather below CLAMPS out-of-range indices under jit, so a
        # mis-sized weights vector would silently train with wrong
        # weights (the one-hot form raises a broadcast error instead)
        raise ValueError(
            f"class_weights has {jnp.shape(class_weights)[0]} entries for "
            f"{logits.shape[-1]} classes"
        )
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = jnp.clip(probs, KERAS_EPSILON, 1.0 - KERAS_EPSILON)
    p_true = jnp.take_along_axis(probs, labels[..., None], axis=-1)[..., 0]
    w = jnp.asarray(class_weights, dtype=jnp.float32)[labels]
    per_voxel = -jnp.log(p_true) * w
    return jnp.mean(per_voxel, axis=tuple(range(1, per_voxel.ndim)))


def binary_crossentropy_from_logits(logits, targets):
    """Keras binary_crossentropy (mean over all non-batch axes), stable form.

    Reference: the U-Net 'sig' head loss (unet/unet.py:256).  Computed from
    logits via the log-sum-exp identity rather than clipping probabilities.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per_elem = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.mean(per_elem, axis=tuple(range(1, per_elem.ndim)))


def mse_flat(x, y):
    """Keras mse over flattened tensors: mean square error per sample.

    Reference: LatticeDFCVAE.mse_loss (vae/lattice_vae.py:232-233) flattens
    both tensors; per-sample mean over all elements.
    """
    x = x.astype(jnp.float32).reshape(x.shape[0], -1)
    y = y.astype(jnp.float32).reshape(y.shape[0], -1)
    return jnp.mean((x - y) ** 2, axis=-1)


def kld_gaussian(z_mean, z_log_var):
    """KL(q(z|x) || N(0, I)) per sample (vae/lattice_vae.py:235-239).

    Explicit-argument form of the reference's graph-side-channel kld_loss:
    -0.5 * sum(1 + log_var - mu^2 - exp(log_var)).
    """
    z_mean = z_mean.astype(jnp.float32)
    z_log_var = z_log_var.astype(jnp.float32)
    kl = 1.0 + z_log_var - jnp.square(z_mean) - jnp.exp(z_log_var)
    return -0.5 * jnp.sum(kl, axis=-1)


def perceptual_feature_loss(feats_true, feats_pred, weights):
    """DFC perceptual loss: weighted per-layer feature MSE, flattened.

    Reference: LatticeDFCVAE.perceptual_loss (vae/lattice_vae.py:257-270).
    feats_*: sequences of (B, ...) activations.  Returns (B,).
    """
    if not (len(feats_true) == len(feats_pred) == len(weights)):
        # zip would silently truncate, dropping taps from the loss
        raise ValueError(
            f"{len(feats_true)}/{len(feats_pred)} feature taps vs "
            f"{len(weights)} weights"
        )
    total = 0.0
    for h1, h2, w in zip(feats_true, feats_pred, weights):
        h1 = h1.astype(jnp.float32).reshape(h1.shape[0], -1)
        h2 = h2.astype(jnp.float32).reshape(h2.shape[0], -1)
        total = total + w * jnp.mean(jnp.square(h1 - h2), axis=-1)
    return total


def mse_loss(preds, targets):
    """Scalar MSE (CGCNN regression, train_cgcnn.py:89): per-sample mean
    first, then batch mean — identical for equal-size samples, and
    batch-size-agnostic under DP like the rest of the module."""
    p = preds.astype(jnp.float32).reshape(preds.shape[0], -1)
    t = targets.astype(jnp.float32).reshape(preds.shape[0], -1)
    return jnp.mean(jnp.mean((p - t) ** 2, axis=-1))


def mae(preds, targets):
    p = preds.astype(jnp.float32).reshape(preds.shape[0], -1)
    t = targets.astype(jnp.float32).reshape(preds.shape[0], -1)
    return jnp.mean(jnp.mean(jnp.abs(p - t), axis=-1))
