"""CGCNN-style element feature vectors, generated from the element tables.

The reference ships a static ``cgcnn/atom_init.json`` (100 elements -> 93-dim
binary vectors; the canonical CGCNN initialization from Xie & Grossman).
Rather than vendoring that file, we synthesize the same *scheme* from our own
element-property tables (crystal/elements.py): one-hot buckets of

    group (18) + period (9) + electronegativity (10) + covalent radius (10)
    + valence electrons (12) + first ionization energy (10)
    + electron affinity (10) + block (4) + molar volume (10)  = 93 dims

Continuous properties are binned uniformly over their observed range (log
scale for ionization energy and molar volume, matching the CGCNN convention);
missing values yield all-zero buckets for that property.
"""

from __future__ import annotations

import functools

import numpy as np

from icsg3d_tpu.crystal import elements

ATOM_FEATURE_DIM = 93


def _bucket(value: float, lo: float, hi: float, n: int, log: bool = False) -> np.ndarray:
    out = np.zeros(n, dtype=np.float32)
    if value is None or np.isnan(value):
        return out
    if log:
        value, lo, hi = np.log(value), np.log(lo), np.log(hi)
    idx = int(np.clip((value - lo) / (hi - lo) * n, 0, n - 1))
    out[idx] = 1.0
    return out


def _one_hot(idx: int, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.float32)
    out[idx] = 1.0
    return out


def atom_features(z: int) -> np.ndarray:
    """93-dim binary feature vector for element Z (1..100)."""
    feats = [
        _one_hot(elements.group(z) - 1, 18),
        _one_hot(elements.period(z) - 1, 9),
        _bucket(elements.ELECTRONEGATIVITY[z], 0.5, 4.0, 10),
        _bucket(elements.COVALENT_RADIUS_PM[z], 25.0, 250.0, 10),
        _one_hot(int(np.clip(elements.valence_electrons(z), 1, 12)) - 1, 12),
        _bucket(elements.FIRST_IONIZATION_EV[z], 1.3, 3.3, 10, log=True),
        _bucket(elements.ELECTRON_AFFINITY_EV[z], -3.0, 3.7, 10),
        _one_hot("spdf".index(elements.block(z)), 4),
        _bucket(elements.MOLAR_VOLUME_CM3[z], 1.5, 4.3, 10, log=True),
    ]
    vec = np.concatenate(feats)
    assert vec.shape == (ATOM_FEATURE_DIM,)
    return vec


@functools.lru_cache(maxsize=1)
def atom_feature_table(max_z: int = elements.MAX_Z) -> np.ndarray:
    """(max_z+1, 93) table indexed by atomic number; row 0 is zeros."""
    table = np.zeros((max_z + 1, ATOM_FEATURE_DIM), dtype=np.float32)
    for z in range(1, max_z + 1):
        table[z] = atom_features(z)
    return table
