"""Loss functions, numerically matching the reference's Keras losses.

All losses take float32 logits/targets and reduce per-sample first, then
mean over the batch, so data-parallel gradient averaging over a mesh is a
plain psum/mean regardless of per-device batch size.
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
    total = 0.0
    for h1, h2, w in zip(feats_true, feats_pred, weights):
        h1 = h1.astype(jnp.float32).reshape(h1.shape[0], -1)
        h2 = h2.astype(jnp.float32).reshape(h2.shape[0], -1)
        total = total + w * jnp.mean(jnp.square(h1 - h2), axis=-1)
    return total


def mse_loss(preds, targets):
    """Plain scalar MSE (CGCNN regression, train_cgcnn.py:89)."""
    return jnp.mean(
        (preds.astype(jnp.float32).ravel() - targets.astype(jnp.float32).ravel())
        ** 2
    )


def mae(preds, targets):
    return jnp.mean(
        jnp.abs(
            preds.astype(jnp.float32).ravel()
            - targets.astype(jnp.float32).ravel()
        )
    )
