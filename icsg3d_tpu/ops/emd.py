"""Earth mover's distance between atom sets (evaluation metric).

Reference: eval.py:45-53 — pad the smaller set with zeros, Hungarian
assignment on the pairwise distance matrix, mean matched distance.
Host-side scipy (the O(n^3) Hungarian solve on <100 atoms is microseconds;
not worth a device kernel).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment
from scipy.spatial.distance import cdist


def earth_movers_distance(mu_pred: np.ndarray, mu_true: np.ndarray) -> float:
    """Mean assigned pairwise distance between two point sets.

    Sets of different sizes are zero-padded to equal length
    (eval.py:46-50), charging unmatched atoms their distance to the origin.
    """
    mu_pred = np.atleast_2d(np.asarray(mu_pred, dtype=float))
    mu_true = np.atleast_2d(np.asarray(mu_true, dtype=float))
    if mu_pred.size == 0:
        mu_pred = np.zeros((1, mu_true.shape[1] if mu_true.size else 3))
    if mu_true.size == 0:
        mu_true = np.zeros((1, mu_pred.shape[1]))
    n = max(len(mu_pred), len(mu_true))
    dim = mu_pred.shape[1]
    a = np.zeros((n, dim))
    b = np.zeros((n, dim))
    a[: len(mu_pred)] = mu_pred
    b[: len(mu_true)] = mu_true
    d = cdist(a, b)
    row, col = linear_sum_assignment(d)
    return float(d[row, col].mean())
