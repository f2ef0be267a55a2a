"""Helpers shared by the three training drivers."""

from __future__ import annotations

import numpy as np


def mean_metrics(history):
    """Mean of each metric over a list of per-step metric dicts."""
    if not history:
        return {}
    return {k: float(np.mean([h[k] for h in history])) for k in history[0]}
