"""Data layer: dataset store, splits, condition binning, class weights,
graph featurization, and synthetic dataset generation.

Replaces the reference's filesystem-of-npy-files + Keras Sequence generators
(vae/data.py, unet/data.py, cgcnn/data.py) with packed array stores and
jit-friendly batch iterators with device prefetch.
"""

from icsg3d_tpu.data.splits import data_split
from icsg3d_tpu.data.binning import quantile_bins, assign_bins, one_hot
from icsg3d_tpu.data.class_weights import inverse_frequency_weights
from icsg3d_tpu.data.store import GridDataset, BatchIterator, prefetch_to_device
from icsg3d_tpu.data.atom_features import atom_feature_table
from icsg3d_tpu.data.graphs import GraphSpec, featurize_structure, gaussian_expand

__all__ = [
    "data_split",
    "quantile_bins",
    "assign_bins",
    "one_hot",
    "inverse_frequency_weights",
    "GridDataset",
    "BatchIterator",
    "prefetch_to_device",
    "atom_feature_table",
    "GraphSpec",
    "featurize_structure",
    "gaussian_expand",
]
