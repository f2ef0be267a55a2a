"""Segmentation metrics matching the reference's Keras metric math.

Reference: unet/unet.py:159-193.  y_true is one-hot, y_pred is softmax
probabilities; round(clip(y_true*y_pred)) counts a true positive wherever
the true class's predicted probability exceeds 0.5.
"""

from __future__ import annotations

import jax.numpy as jnp

KERAS_EPSILON = 1e-7


def _round_clip(x):
    return jnp.round(jnp.clip(x, 0.0, 1.0))


def recall(y_true, y_pred):
    """r_m (unet/unet.py:159-167)."""
    tp = jnp.sum(_round_clip(y_true * y_pred))
    possible = jnp.sum(_round_clip(y_true))
    return tp / (possible + KERAS_EPSILON)


def weighted_recall(y_true, y_pred, num_classes: int = 95):
    """wr_m: recall excluding the background class (unet/unet.py:170-179)."""
    w = jnp.ones(num_classes).at[0].set(0.0)
    tp = jnp.sum(_round_clip(w * y_true * y_pred))
    possible = jnp.sum(_round_clip(w * y_true))
    return tp / (possible + KERAS_EPSILON)


def precision(y_true, y_pred):
    """p_m (unet/unet.py:182-187)."""
    tp = jnp.sum(_round_clip(y_true * y_pred))
    predicted = jnp.sum(_round_clip(y_pred))
    return tp / (predicted + KERAS_EPSILON)


def f1_score(y_true, y_pred):
    """f1_m (unet/unet.py:189-193)."""
    p = precision(y_true, y_pred)
    r = recall(y_true, y_pred)
    return 2.0 * p * r / (p + r + KERAS_EPSILON)
