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


# -- integer-label forms ------------------------------------------------------
# Mathematically identical to the one-hot forms above (y_true one-hot rows
# have exactly one 1), but never materialize the (B, d^3, C) one-hot — the
# hot path ships int32 labels to the device instead of 95x f32 planes.


def _p_true(labels, probs):
    """Probability of each voxel's true class.

    NOTE: the gather CLAMPS out-of-range labels under jit (a label >=
    num_classes silently counts the last class's probability where the
    one-hot form counts zero) — callers must pre-clip labels to the
    class range, as prepare_unet_batch does.
    """
    return jnp.take_along_axis(probs, labels[..., None], axis=-1)[..., 0]


def recall_from_labels(labels, probs):
    tp = jnp.sum(jnp.round(_p_true(labels, probs)))
    possible = jnp.asarray(labels.size, jnp.float32)
    return tp / (possible + KERAS_EPSILON)


def weighted_recall_from_labels(labels, probs):
    fg = labels != 0
    tp = jnp.sum(jnp.round(_p_true(labels, probs)) * fg)
    possible = jnp.sum(fg.astype(jnp.float32))
    return tp / (possible + KERAS_EPSILON)


def precision_from_labels(labels, probs):
    tp = jnp.sum(jnp.round(_p_true(labels, probs)))
    predicted = jnp.sum(jnp.round(jnp.clip(probs, 0.0, 1.0)))
    return tp / (predicted + KERAS_EPSILON)


def f1_score_from_labels(labels, probs):
    # shared tp: going through precision_/recall_from_labels would run
    # the gather/round/sum chain twice (and, eager over the tunnel, leak
    # twice the intermediates)
    tp = jnp.sum(jnp.round(_p_true(labels, probs)))
    predicted = jnp.sum(jnp.round(jnp.clip(probs, 0.0, 1.0)))
    possible = jnp.asarray(labels.size, jnp.float32)
    p = tp / (predicted + KERAS_EPSILON)
    r = tp / (possible + KERAS_EPSILON)
    return 2.0 * p * r / (p + r + KERAS_EPSILON)
