"""Tests for the data layer: splits, binning, class weights, store,
synthetic datasets, atom features, and graph featurization."""

import numpy as np
import pandas as pd
import pytest

from icsg3d_tpu.config import GridSpec, VoxelizerConfig
from icsg3d_tpu.data import (
    BatchIterator,
    GraphSpec,
    GridDataset,
    assign_bins,
    atom_feature_table,
    data_split,
    featurize_structure,
    gaussian_expand,
    inverse_frequency_weights,
    one_hot,
    prefetch_to_device,
    quantile_bins,
)
from icsg3d_tpu.data.binning import bin_and_encode
from icsg3d_tpu.data.synthetic import build_dataset, random_structures, synthetic_target


class TestDataSplit:
    def test_rotations_follow_parent(self):
        ids = []
        for i in range(10):
            ids.append(f"mp-{i}")
            ids.extend(f"mp-{i}_rot_{r}" for r in range(3))
        train, val = data_split(ids, frac=0.8, n_rot=3)
        train_parents = {i.split("_rot_")[0] for i in train}
        val_parents = {i.split("_rot_")[0] for i in val}
        assert not train_parents & val_parents
        assert len(train) + len(val) == len(ids)
        # every rotation is in the same split as its parent
        for t in train:
            assert t.split("_rot_")[0] in train_parents

    def test_ids_ending_in_strip_chars_survive(self):
        # The reference's str.strip(".npy") bug corrupted IDs ending in n/p/y.
        ids = ["mp-1234y", "mp-1234y_rot_0", "abcn", "abcn_rot_0"]
        train, val = data_split(ids, frac=0.5, n_rot=1, shuffle=False)
        assert sorted(train + val) == sorted(ids)

    def test_deterministic_seed(self):
        ids = [f"s{i}" for i in range(20)]
        a = data_split(ids, n_rot=0, seed=28)
        b = data_split(ids, n_rot=0, seed=28)
        assert a == b

    def test_frac(self):
        ids = [f"s{i}" for i in range(10)]
        train, val = data_split(ids, frac=0.8, n_rot=0)
        assert len(train) == 8 and len(val) == 2


class TestBinning:
    def test_matches_pandas_qcut(self, rng):
        vals = rng.normal(size=500)
        edges = quantile_bins(vals, 10)
        got = assign_bins(vals, edges)
        want = pd.qcut(vals, 10, labels=np.arange(10)).astype(int)
        assert np.array_equal(got, np.asarray(want))

    def test_one_hot(self):
        oh = one_hot(np.array([0, 3, 9]), 10)
        assert oh.shape == (3, 10)
        assert np.array_equal(oh.argmax(-1), [0, 3, 9])
        assert np.all(oh.sum(-1) == 1)

    def test_bin_and_encode_clips_outliers(self):
        vals = np.arange(100.0)
        _, _, edges = bin_and_encode(vals, 10)
        assert assign_bins(np.array([-1e9]), edges)[0] == 0
        assert assign_bins(np.array([1e9]), edges)[0] == 9


class TestClassWeights:
    def test_inverse_frequency(self):
        S = np.array([0, 0, 0, 1, 1, 2])
        w = inverse_frequency_weights(S, n_classes=4)
        assert w[0] == pytest.approx(6 / 3)
        assert w[1] == pytest.approx(6 / 2)
        assert w[2] == pytest.approx(6 / 1)
        assert w[3] == 0.0  # absent class


GRID = GridSpec(d=8)
VCFG = VoxelizerConfig(grid=GRID, site_pad=16)


class TestSyntheticAndStore:
    def test_build_and_reload(self, tmp_path):
        ds = build_dataset(str(tmp_path / "ds"), n=4, cfg=VCFG)
        assert len(ds) == 4
        assert ds.arrays["density"].shape == (4, 8, 8, 8)
        assert ds.arrays["coords"].shape == (4, 8, 8, 8, 3)
        assert ds.arrays["species"].shape == (4, 8, 8, 8)
        # reload from disk
        ds2 = GridDataset(str(tmp_path / "ds"))
        assert ds2.ids == ds.ids
        assert np.allclose(ds2.arrays["density"][0], ds.arrays["density"][0])
        # density is positive around sites, species has atoms
        assert ds.arrays["density"].max() > 0
        assert (np.asarray(ds.arrays["species"]) > 0).any()

    def test_rotation_rows(self, tmp_path):
        ds = build_dataset(str(tmp_path / "ds"), n=2, cfg=VCFG, n_rot=2)
        assert len(ds) == 2 * 3
        assert "syn-0_rot_1" in ds.ids
        base = np.asarray(ds.arrays["density"][ds.index["syn-0"]])
        rot = np.asarray(ds.arrays["density"][ds.index["syn-0_rot_0"]])
        # rotation preserves mass exactly (pure permutation)
        assert np.isclose(base.sum(), rot.sum(), rtol=1e-6)

    def test_batch_iterator(self, tmp_path):
        ds = build_dataset(str(tmp_path / "ds"), n=5, cfg=VCFG)
        it = BatchIterator(ds, ds.ids, batch_size=2, fields=("density", "species"))
        batches = list(it)
        assert len(batches) == 2  # remainder dropped
        assert batches[0]["density"].shape == (2, 8, 8, 8)

    def test_batch_iterator_extra_and_shuffle(self, tmp_path):
        ds = build_dataset(str(tmp_path / "ds"), n=6, cfg=VCFG)
        cond = np.arange(6, dtype=np.float32)[:, None]
        a = list(BatchIterator(ds, ds.ids, 3, extra={"cond": cond}, shuffle=True, seed=1))
        assert a[0]["cond"].shape == (3, 1)
        seen = np.concatenate([b["cond"][:, 0] for b in a])
        assert sorted(seen.tolist()) == list(range(6))

    def test_prefetch_to_device(self, tmp_path):
        ds = build_dataset(str(tmp_path / "ds"), n=4, cfg=VCFG)
        it = BatchIterator(ds, ds.ids, 2, fields=("density",))
        out = list(prefetch_to_device(iter(it)))
        assert len(out) == 2
        assert out[0]["density"].shape == (2, 8, 8, 8)

    def test_target_is_informative(self):
        structs = random_structures(8, seed=3, kinds=("perovskite", "rocksalt"))
        targets = [synthetic_target(s) for s in structs]
        assert np.std(targets) > 0.01


class TestAtomFeatures:
    def test_table_shape_and_binary(self):
        t = atom_feature_table()
        assert t.shape == (101, 93)
        assert np.all((t == 0) | (t == 1))
        assert np.all(t[0] == 0)

    def test_distinct_elements_distinct_features(self):
        t = atom_feature_table()
        assert not np.array_equal(t[8], t[26])  # O vs Fe
        assert not np.array_equal(t[11], t[19])  # Na vs K

    def test_group_period_blocks(self):
        t = atom_feature_table()
        # Na (Z=11): group 1 -> feature 0 set; period 3 -> feature 18+2
        assert t[11][0] == 1
        assert t[11][18 + 2] == 1


class TestGraphFeaturizer:
    def test_perovskite_graph(self):
        s = random_structures(1, seed=0)[0]
        spec = GraphSpec()
        g = featurize_structure(s, spec)
        assert g["atom_fea"].shape == (50, 93)
        assert g["nbr_dist"].shape == (50, 12)
        assert g["atom_mask"].sum() == 5
        # every real atom has 12 neighbors within 8 A in a perovskite
        real = g["nbr_dist"][:5]
        assert np.all(real < 8.0)
        # neighbor distances sorted ascending per atom
        assert np.all(np.diff(real, axis=1) >= -1e-6)
        # nearest-neighbor distance is the B-X bond or A-X distance, < a0
        assert real.min() < 3.0

    def test_padding_semantics(self):
        s = random_structures(1, seed=0)[0]
        spec = GraphSpec(max_atoms=10)
        g = featurize_structure(s, spec)
        assert np.all(g["nbr_idx"][5:] == 9)
        assert np.all(g["nbr_dist"][5:] == spec.radius + 1.0)
        assert np.all(g["atom_fea"][5:] == 0)

    def test_gaussian_expand_matches_reference_math(self):
        spec = GraphSpec()
        d = np.array([0.0, 1.0, 4.0])
        got = np.asarray(gaussian_expand(d, spec))
        centers = np.arange(0, 8.2, 0.2)
        want = np.exp(-((d[:, None] - centers) ** 2) / 0.2**2)
        assert got.shape == (3, 41)
        assert np.allclose(got, want, rtol=1e-5)
