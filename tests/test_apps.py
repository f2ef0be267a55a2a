"""Application-layer tests: end-to-end generate/evaluate/interpolate on tiny
trained models, CLI smoke tests, CIF dataset building, EMD metric."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from icsg3d_tpu.apps import common


def _cpu_subprocess_env():
    """Env for CLI subprocesses pinned to CPU.

    JAX_PLATFORMS=cpu alone is not enough: the axon sitecustomize hook
    registers the TPU PJRT plugin whenever PALLAS_AXON_POOL_IPS is set,
    which dials the tunnel at import time — when the tunnel is down the
    subprocess hangs before jax ever reads JAX_PLATFORMS.  Dropping the
    pool var skips registration entirely, keeping these CPU-only smoke
    tests independent of tunnel health.
    """
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


from icsg3d_tpu.apps.generate import generate_structures, predict_properties
from icsg3d_tpu.apps.evaluate import evaluate_reconstructions
from icsg3d_tpu.apps.interpolate import interpolate_latents
from icsg3d_tpu.apps.voxelize import build_from_cifs, voxelize_structures
from icsg3d_tpu.config import (
    CGCNNConfig,
    GridSpec,
    PipelineConfig,
    TrainConfig,
    UNetConfig,
    VAEConfig,
    VoxelizerConfig,
)
from icsg3d_tpu.crystal.cif import write_cif
from icsg3d_tpu.data.binning import bin_and_encode
from icsg3d_tpu.data.synthetic import build_dataset, random_structures
from icsg3d_tpu.ops.emd import earth_movers_distance

GRID = GridSpec(d=8)
PIPE = PipelineConfig(grid=GRID, binary_threshold=0.5)
UNET_CFG = UNetConfig(num_classes=60, dtype="float32")
VAE_CFG = VAEConfig(grid=GRID, filters=(4, 8), latent_dim=8, dtype="float32")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = tmp_path_factory.mktemp("appds") / "synth"
    return build_dataset(
        str(path), n=6, cfg=VoxelizerConfig(grid=GRID, site_pad=16)
    )


@pytest.fixture(scope="module")
def models():
    """Untrained tiny models (apps must run regardless of training state)."""
    vae_model, vae_vars = common.load_vae(VAE_CFG, None)
    unet_model, unet_vars = common.load_unet(UNET_CFG, None, grid_d=GRID.d)
    return vae_model, vae_vars, unet_model, unet_vars


class TestEMD:
    def test_identical_sets(self):
        a = np.array([[0.0, 0, 0], [1, 1, 1]])
        assert earth_movers_distance(a, a) == 0.0

    def test_known_offset(self):
        a = np.array([[0.0, 0, 0]])
        b = np.array([[3.0, 4, 0]])
        assert earth_movers_distance(a, b) == pytest.approx(5.0)

    def test_unequal_sizes_reference_semantics(self):
        # reference eval.py:45-53: rectangular assignment (min-pairs
        # matched), cost / min(len) — NO zero padding.  The closest pair
        # matches at cost 0; divided by min=1 -> 0.0
        a = np.array([[1.0, 0, 0]])
        b = np.array([[1.0, 0, 0], [0, 2, 0]])
        assert earth_movers_distance(a, b) == pytest.approx(0.0)
        # and a genuinely offset pair still scores its distance
        c = np.array([[0.0, 2, 0]])
        assert earth_movers_distance(c, b) == pytest.approx(0.0)
        d = np.array([[4.0, 2, 0]])
        # nearest pair is [1,0,0] at sqrt(9+4)
        assert earth_movers_distance(d, b) == pytest.approx(np.sqrt(13.0))

    def test_empty_pred_is_nan(self):
        # the reference's 0/0; evaluate counts these as n_emd_undefined
        assert np.isnan(
            earth_movers_distance(np.zeros((0, 3)), np.array([[1.0, 1, 1]]))
        )
        assert earth_movers_distance(np.zeros((0, 3)), np.zeros((0, 3))) == 0.0

    def test_dim_mismatch_rejected(self):
        with pytest.raises(ValueError, match="dims"):
            earth_movers_distance(np.ones((2, 3)), np.ones((2, 1)))


class TestGenerate:
    def test_generate_structures(self, dataset, models):
        vae_model, vae_vars, unet_model, unet_vars = models
        _, conds, _ = bin_and_encode(np.asarray(dataset.arrays["target"]), 10)
        records = generate_structures(
            vae_model, vae_vars, unet_model, unet_vars,
            np.asarray(dataset.arrays["density"][0]),
            np.asarray(dataset.arrays["coords"][0]),
            conds[0],
            n_samples=4, batch_size=2, pipe=PIPE,
        )
        assert len(records) == 4
        for r in records:
            assert "lattice" in r and len(r["lattice"]) == 3

    def test_predict_properties_batched(self, dataset, models):
        """Valid structures get a property from a single weight load."""
        structures = random_structures(3, seed=0)
        records = [{"structure": s, "valid": True} for s in structures]
        cfg = CGCNNConfig()
        predict_properties(records, cfg, {"formation_energy": None})
        for r in records:
            assert "formation_energy" in r["properties"]
            assert np.isfinite(r["properties"]["formation_energy"])

    def test_predict_multiple_properties_per_sample(self):
        """The reference's multi-property loop (generate.py:280-286): one
        generate run annotates every sample with >= 2 predicted properties,
        one checkpoint per property (incl. a dotted MP-schema name)."""
        structures = random_structures(3, seed=2)
        records = [{"structure": s, "valid": True} for s in structures]
        predict_properties(
            records, CGCNNConfig(),
            {"formation_energy_per_atom": None,
             "elasticity.K_Voigt_Reuss_Hill": None},
        )
        for r in records:
            props = r["properties"]
            assert set(props) == {
                "formation_energy_per_atom", "elasticity.K_Voigt_Reuss_Hill"
            }
            assert all(np.isfinite(v) for v in props.values())


class TestEvaluate:
    def test_evaluate_runs(self, dataset, models):
        vae_model, vae_vars, unet_model, unet_vars = models
        _, conds, _ = bin_and_encode(np.asarray(dataset.arrays["target"]), 10)
        ids = dataset.ids[:4]
        conds4 = conds[:4]
        out = evaluate_reconstructions(
            vae_model, vae_vars, unet_model, unet_vars,
            dataset, ids, conds4, batch_size=2, pipe=PIPE,
        )
        assert set(out) >= {"mean_emd", "mean_datoms", "mean_dlattice"}
        # ground truth side always extracts atoms, so evals complete
        assert out["n_evaluated"] > 0
        assert np.isfinite(out["mean_emd"])


class TestInterpolate:
    def test_interpolation_shapes_and_endpoints(self, dataset, models):
        vae_model, vae_vars, _, _ = models
        _, conds, _ = bin_and_encode(np.asarray(dataset.arrays["target"]), 10)
        x_a = common.grid_input(
            np.asarray(dataset.arrays["density"][0])[None],
            np.asarray(dataset.arrays["coords"][0])[None],
        )[0]
        x_b = common.grid_input(
            np.asarray(dataset.arrays["density"][1])[None],
            np.asarray(dataset.arrays["coords"][1])[None],
        )[0]
        grids = interpolate_latents(
            vae_model, vae_vars, x_a, conds[0], x_b, conds[1], n_interps=5
        )
        # n_interps decoded steps framed by the RAW endpoints (reference
        # strip layout [a, interps..., b] — same contract as the sweep)
        assert grids.shape == (7, 8, 8, 8, 4)
        assert np.allclose(grids[0], x_a, atol=1e-6)
        assert np.allclose(grids[-1], x_b, atol=1e-6)
        assert np.isfinite(grids).all()

    def test_sweep_conds_parity(self, dataset):
        """Per-condition-bin sweep (interpolate.py:47-64,107-110): one strip
        per populated bin, fixed one-hot per bin, raw a/b endpoints
        concatenated onto the strip."""
        from icsg3d_tpu.apps.interpolate import interpolate_sweep

        n_bins = 3  # 6 samples / 3 bins -> every bin populated with a pair
        vae_model, vae_vars = common.load_vae(
            VAEConfig(grid=GRID, filters=(4, 8), latent_dim=8,
                      dtype="float32", cond_bins=n_bins),
            None,
        )
        bin_idx, _, _ = bin_and_encode(
            np.asarray(dataset.arrays["target"]), n_bins
        )
        rows, meta = interpolate_sweep(
            vae_model, vae_vars, dataset, bin_idx, n_bins,
            n_interps=4, seed=0,
        )
        populated = [b for b in range(n_bins) if (bin_idx == b).sum() >= 2]
        assert [m["bin"] for m in meta] == populated
        for row, m in zip(rows, meta):
            assert row.shape == (4 + 2, 8, 8, 8, 4)  # endpoints included
            # endpoints are the RAW grids of the chosen pair, not decodes
            ia, ib = dataset.index[m["a"]], dataset.index[m["b"]]
            x_a = common.grid_input(
                np.asarray(dataset.arrays["density"][ia])[None],
                np.asarray(dataset.arrays["coords"][ia])[None],
            )[0]
            x_b = common.grid_input(
                np.asarray(dataset.arrays["density"][ib])[None],
                np.asarray(dataset.arrays["coords"][ib])[None],
            )[0]
            assert np.allclose(row[0], x_a, atol=1e-6)
            assert np.allclose(row[-1], x_b, atol=1e-6)
            assert m["a"] != m["b"]
            assert np.isfinite(row).all()


class TestVoxelizeApp:
    def test_nonorthogonal_cell_atoms_stay_in_grid(self):
        """Hexagonal cells: sites map as frac*abc (the reference's
        axis-aligned box convention) — true skew-matrix cartesians pushed
        atoms outside the sampled box, clipping their density and species
        voxels entirely."""
        from icsg3d_tpu.crystal.lattice import Lattice
        from icsg3d_tpu.crystal.structure import Site, Structure
        from icsg3d_tpu.data.voxel_build import voxelize_structures

        lat = Lattice.from_parameters(5.0, 5.0, 5.0, 90.0, 90.0, 120.0)
        s = Structure(lat, [
            Site(11, np.array([0.05, 0.95, 0.5])),
            Site(17, np.array([0.5, 0.5, 0.5])),
        ])
        ids, arrays = voxelize_structures(
            [s], ["hex-0"], [0.0],
            cfg=VoxelizerConfig(grid=GRID, site_pad=8),
        )
        species = np.asarray(arrays["species"][0])
        present = set(np.unique(species).tolist())
        assert 11 in present and 17 in present, present

    def test_dotted_target_column(self, tmp_path):
        """MP sub-document columns ("elasticity.K_Voigt_Reuss_Hill") pass
        through the CSV target plumbing verbatim (query schema parity)."""
        structures = random_structures(2, seed=9)
        cif_dir = tmp_path / "cifs"
        os.makedirs(cif_dir)
        for i, s in enumerate(structures):
            write_cif(s, str(cif_dir / f"mp-{i}.cif"))
        csv_path = tmp_path / "props.csv"
        with open(csv_path, "w") as f:
            f.write("task_id,elasticity.K_Voigt_Reuss_Hill\n")
            f.write("mp-0,110.5\nmp-1,95.0\n")
        ds = build_from_cifs(
            str(cif_dir), str(tmp_path / "out"),
            targets_csv=str(csv_path),
            target_column="elasticity.K_Voigt_Reuss_Hill",
            cfg=VoxelizerConfig(grid=GRID, site_pad=16),
            process_index=0, process_count=1,
        )
        assert sorted(np.asarray(ds.arrays["target"]).tolist()) == [95.0, 110.5]

    def test_build_from_cifs_roundtrip(self, tmp_path):
        """Write structures as CIFs, rebuild a dataset from them."""
        structures = random_structures(3, seed=1)
        cif_dir = tmp_path / "cifs"
        os.makedirs(cif_dir)
        for i, s in enumerate(structures):
            write_cif(s, str(cif_dir / f"mp-{i}.cif"))
        csv_path = tmp_path / "props.csv"
        with open(csv_path, "w") as f:
            f.write("task_id,formation_energy_per_atom\n")
            for i in range(3):
                f.write(f"mp-{i},{-1.0 - i}\n")
        ds = build_from_cifs(
            str(cif_dir), str(tmp_path / "out"),
            targets_csv=str(csv_path),
            cfg=VoxelizerConfig(grid=GRID, site_pad=16),
            process_index=0, process_count=1,
        )
        assert len(ds) == 3
        assert np.allclose(
            sorted(np.asarray(ds.arrays["target"])), [-3.0, -2.0, -1.0]
        )
        assert ds.arrays["density"].shape == (3, 8, 8, 8)

    def test_process_striding_is_disjoint(self, tmp_path):
        structures = random_structures(4, seed=2)
        cif_dir = tmp_path / "cifs"
        os.makedirs(cif_dir)
        for i, s in enumerate(structures):
            write_cif(s, str(cif_dir / f"mp-{i}.cif"))
        ds0 = build_from_cifs(
            str(cif_dir), str(tmp_path / "o"),
            cfg=VoxelizerConfig(grid=GRID, site_pad=16),
            process_index=0, process_count=2,
        )
        ds1 = build_from_cifs(
            str(cif_dir), str(tmp_path / "o"),
            cfg=VoxelizerConfig(grid=GRID, site_pad=16),
            process_index=1, process_count=2,
        )
        assert not set(ds0.ids) & set(ds1.ids)
        assert len(ds0) + len(ds1) == 4

    def test_merge_parts(self, tmp_path):
        from icsg3d_tpu.apps.voxelize import merge_parts

        structures = random_structures(4, seed=2)
        cif_dir = tmp_path / "cifs"
        os.makedirs(cif_dir)
        for i, s in enumerate(structures):
            write_cif(s, str(cif_dir / f"mp-{i}.cif"))
        for pidx in range(2):
            build_from_cifs(
                str(cif_dir), str(tmp_path / "o"),
                cfg=VoxelizerConfig(grid=GRID, site_pad=16),
                process_index=pidx, process_count=2,
            )
        merged = merge_parts(str(tmp_path / "o"))
        assert len(merged) == 4

    def test_skips_oversized(self):
        structures = random_structures(2, seed=0, kinds=("rocksalt",))  # 8 sites
        ids, arrays = voxelize_structures(
            structures, ["a", "b"], [0.0, 0.0],
            cfg=VoxelizerConfig(grid=GRID, max_sites=5, site_pad=16),
        )
        assert ids == []  # all skipped
        assert arrays["density"].shape[0] == 0


class TestResolveGridD:
    """--d on the train CLIs must agree with the dataset's packed grid
    resolution; silently building a d=32 model over d=16 batches used to
    die with an opaque Flax param-shape error in the first step."""

    class _DS:
        d = 16
        path = "/tmp/ds"

    def test_default_adopts_dataset_d(self):
        from icsg3d_tpu.apps.common import resolve_grid_d

        assert resolve_grid_d(None, self._DS()) == 16

    def test_matching_flag_ok(self):
        from icsg3d_tpu.apps.common import resolve_grid_d

        assert resolve_grid_d(16, self._DS()) == 16

    def test_mismatch_is_hard_error(self):
        from icsg3d_tpu.apps.common import resolve_grid_d

        with pytest.raises(SystemExit, match="does not match"):
            resolve_grid_d(32, self._DS())


class TestCLIs:
    def test_voxelize_cli_synthetic(self, tmp_path):
        env = _cpu_subprocess_env()
        out = subprocess.run(
            [
                sys.executable, "-m", "icsg3d_tpu.apps.voxelize",
                "--synthetic", "3", "--out", str(tmp_path / "ds"),
                "--d", "8", "--nrot", "1",
            ],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=600,
        )
        assert out.returncode == 0, out.stderr
        assert "wrote 6 samples" in out.stdout

    def test_query_cli_degrades_without_pymatgen(self):
        env = _cpu_subprocess_env()
        out = subprocess.run(
            [
                sys.executable, "-m", "icsg3d_tpu.apps.query",
                "--key", "X", "--name", "t",
            ],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert out.returncode == 1
        assert "voxelize" in out.stderr  # points at offline path


class TestFusedGenerate:
    def test_fused_matches_shapes_and_runs(self, dataset, models):
        from icsg3d_tpu.apps.generate import generate_structures_fused

        vae_model, vae_vars, unet_model, unet_vars = models
        _, conds, _ = bin_and_encode(np.asarray(dataset.arrays["target"]), 10)
        records = generate_structures_fused(
            vae_model, vae_vars, unet_model, unet_vars,
            np.asarray(dataset.arrays["density"][0]),
            np.asarray(dataset.arrays["coords"][0]),
            conds[0],
            n_samples=4, batch_size=2, pipe=PIPE, max_atoms=16,
        )
        assert len(records) == 4
        for r in records:
            assert "lattice" in r
            if r.get("structure") is not None:
                assert len(r["atoms"]) == len(r["coords"])


class TestPredictApp:
    def test_predict_from_cifs(self, tmp_path):
        from icsg3d_tpu.apps.predict import predict_from_cifs

        structures = random_structures(2, seed=5)
        paths = []
        for i, s in enumerate(structures):
            p = str(tmp_path / f"s{i}.cif")
            write_cif(s, p)
            paths.append(p)
        # plus one unparseable file
        bad = str(tmp_path / "bad.cif")
        open(bad, "w").write("not a cif")
        records = predict_from_cifs(paths + [bad], {"fe": None})
        assert len(records) == 3
        assert np.isfinite(records[0]["properties"]["fe"])
        assert "error" in records[2]


class TestCLIHelp:
    @pytest.mark.parametrize(
        "module",
        [
            "voxelize", "train_unet", "train_vae", "train_cgcnn",
            "generate", "evaluate", "interpolate", "view", "predict", "query",
        ],
    )
    def test_help_exits_zero(self, module):
        env = _cpu_subprocess_env()
        out = subprocess.run(
            [sys.executable, "-m", f"icsg3d_tpu.apps.{module}", "--help"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert out.returncode == 0, out.stderr
        assert "usage" in out.stdout.lower()


class TestViewApp:
    def test_view_samples_writes_panels(self, dataset, models, tmp_path):
        from icsg3d_tpu.apps.view import view_samples
        from icsg3d_tpu.data.binning import bin_and_encode

        vae_model, vae_vars, unet_model, unet_vars = models
        _, conds, _ = bin_and_encode(np.asarray(dataset.arrays["target"]), 10)
        out = tmp_path / "view"
        records = view_samples(
            vae_model, vae_vars, unet_model, unet_vars,
            dataset, dataset.ids[:2], conds, str(out), PIPE, voxels=True,
        )
        assert len(records) == 2
        for r in records:
            assert np.isfinite(r["mse"]) and np.isfinite(r["f1"])
            for suffix in ("recon", "true_species", "pred_species", "voxels"):
                f = out / f"{r['id']}_{suffix}.png"
                assert f.exists() and f.stat().st_size > 0


class TestEvaluatePlots:
    def test_per_sample_records_and_plot_files(self, dataset, models, tmp_path):
        from icsg3d_tpu.apps.evaluate import evaluate_reconstructions, save_eval_plots

        vae_model, vae_vars, unet_model, unet_vars = models
        _, conds, _ = bin_and_encode(np.asarray(dataset.arrays["target"]), 10)
        ids = dataset.ids[:4]
        out = evaluate_reconstructions(
            vae_model, vae_vars, unet_model, unet_vars,
            dataset, ids, conds[:4], batch_size=2, pipe=PIPE,
        )
        assert len(out["emds"]) == out["n_evaluated"]
        assert len(out["lattice_true"]) == len(out["lattice_pred"])
        plots = tmp_path / "plots"
        save_eval_plots(out, str(plots))
        for name in ("parity_a", "err_hist_b", "emd_hist"):
            f = plots / f"{name}.png"
            assert f.exists() and f.stat().st_size > 0


class TestGenerateAnnotations:
    def test_annotate_records_stats(self, tmp_path):
        from icsg3d_tpu.apps.generate import _write_results_csv, annotate_records

        records = [
            {"valid": True, "atoms": [11, 17],
             "properties": {"formation_energy": -2.0}},
            {"valid": True, "atoms": [11, 11, 17]},
            {"valid": False},
        ]
        annotate_records(records, base_target=-1.0, target="formation_energy")
        assert records[0]["charge_balanced"] == 1      # NaCl
        assert records[1]["charge_balanced"] == 0      # Na2Cl
        assert records[0]["target_diff_pct"] == pytest.approx(1.0)
        assert "target_diff_pct" not in records[1]
        assert 0.5 < records[0]["electronegativity"] < 4.0

        path = tmp_path / "results.csv"
        _write_results_csv(records, str(path))
        text = path.read_text().splitlines()
        assert "charge_balanced" in text[0] and "formation_energy" in text[0]
        assert len(text) == 4  # header + 3 rows


class TestSaveGrids:
    def test_keep_grids_on_records(self, dataset, models):
        vae_model, vae_vars, unet_model, unet_vars = models
        _, conds, _ = bin_and_encode(np.asarray(dataset.arrays["target"]), 10)
        records = generate_structures(
            vae_model, vae_vars, unet_model, unet_vars,
            np.asarray(dataset.arrays["density"][0]),
            np.asarray(dataset.arrays["coords"][0]),
            conds[0],
            n_samples=2, batch_size=2, pipe=PIPE, keep_grids=True,
        )
        assert len(records) == 2
        for r in records:
            assert r["density_grid"].dtype == np.float16
            assert r["species_grid"].dtype == np.uint8
            assert r["density_grid"].shape == (8, 8, 8)


class TestQueryOffline:
    def test_from_json_writes_reference_layout(self, tmp_path):
        """--from-json replays a saved MPRester dump into the reference's
        data/<name>/{cifs/*.cif, <name>.csv} layout with the full 13-field
        schema incl. dotted sub-document columns."""
        import csv as _csv

        from icsg3d_tpu.apps.query import run_query, PROPERTIES

        docs = [
            {
                "task_id": "mp-1", "pretty_formula": "LaFeO3",
                "formation_energy_per_atom": -2.5, "cif": "data_mp-1\n",
                "band_gap": 2.1, "diel.poly_electronic": 9.6,
                "diel.refractive_index": 3.1, "piezo.eij_max": 0.4,
                "energy_per_atom": -7.1,
                "elasticity.K_Voigt_Reuss_Hill": 150.0,
                "elasticity.G_Voigt_Reuss_Hill": 60.0,
                "elasticity.poisson_ratio": 0.3, "nsites": 5,
            },
            {"task_id": "mp-2", "pretty_formula": "SrTiO3",
             "formation_energy_per_atom": -3.1, "cif": "data_mp-2\n",
             "nsites": 5},
        ]
        dump = tmp_path / "dump.json"
        with open(dump, "w") as f:
            json.dump(docs, f)
        rc = run_query(None, "demo", out=str(tmp_path), from_json=str(dump))
        assert rc == 0
        assert (tmp_path / "demo" / "cifs" / "mp-1.cif").exists()
        assert (tmp_path / "demo" / "cifs" / "mp-2.cif").exists()
        with open(tmp_path / "demo" / "demo.csv") as f:
            rows = list(_csv.DictReader(f))
        assert len(rows) == 2
        assert set(rows[0]) == {k for k in PROPERTIES if k != "cif"}
        assert rows[0]["elasticity.K_Voigt_Reuss_Hill"] == "150.0"
        assert rows[1]["diel.poly_electronic"] == ""  # missing sub-doc ok


class TestMergeCloseAtoms:
    """merge_close_atoms: sub-cutoff clusters collapse to their centroid
    with majority species; distant atoms are untouched."""

    def test_identity_when_off(self):
        from icsg3d_tpu.apps.generate import merge_close_atoms

        z = np.array([8, 22])
        c = np.array([[0.0, 0, 0], [0.1, 0, 0]])
        z2, c2 = merge_close_atoms(z, c, 0.0)
        assert len(z2) == 2

    def test_merges_cluster_to_centroid(self):
        from icsg3d_tpu.apps.generate import merge_close_atoms

        z = np.array([19, 19, 19, 8])
        c = np.array([
            [0.0, 0.0, 0.0], [0.3, 0.0, 0.0], [0.0, 0.3, 0.0],
            [3.0, 3.0, 3.0],
        ])
        z2, c2 = merge_close_atoms(z, c, 0.7)
        assert sorted(z2.tolist()) == [8, 19]
        k = c2[list(z2).index(19)]
        np.testing.assert_allclose(k, [0.1, 0.1, 0.0], atol=1e-9)

    def test_single_linkage_chain(self):
        from icsg3d_tpu.apps.generate import merge_close_atoms

        # a chain where ends are > cutoff apart but linked through the
        # middle still merges into ONE atom (single linkage)
        z = np.array([19, 19, 19])
        c = np.array([[0.0, 0, 0], [0.5, 0, 0], [1.0, 0, 0]])
        z2, _ = merge_close_atoms(z, c, 0.6)
        assert len(z2) == 1

    def test_majority_species_wins(self):
        from icsg3d_tpu.apps.generate import merge_close_atoms

        z = np.array([19, 19, 17])
        c = np.array([[0.0, 0, 0], [0.1, 0, 0], [0.2, 0, 0]])
        z2, _ = merge_close_atoms(z, c, 0.7)
        assert z2.tolist() == [19]

    def test_distant_atoms_untouched(self):
        from icsg3d_tpu.apps.generate import merge_close_atoms

        rng = np.random.default_rng(0)
        c = rng.uniform(0, 10, (6, 3))
        # spread out: min pairwise distance > 1 with high probability
        while True:
            d = np.linalg.norm(c[:, None] - c[None], axis=-1)
            if (d[np.triu_indices(6, 1)] > 1.0).all():
                break
            c = rng.uniform(0, 10, (6, 3))
        z = np.arange(1, 7)
        z2, c2 = merge_close_atoms(z, c, 0.7)
        assert len(z2) == 6
        np.testing.assert_allclose(np.sort(c2, axis=0), np.sort(c, axis=0))


class TestHistoryAppend:
    """Chunked --resume campaigns accumulate the full training curve:
    each chunk's _finish appends its epochs to ckpt/history.json instead
    of overwriting it with the last 10-25 epochs (tools/campaign_*.sh
    run fresh processes per chunk — axon host-RAM leak)."""

    @staticmethod
    def _args(ckpt, resume):
        import argparse

        return argparse.Namespace(ckpt=str(ckpt), resume=resume)

    @staticmethod
    def _entry(loss):
        return {"train": {"loss": loss}, "val": {"loss": loss},
                "time": 1.0, "steps": 2}

    @pytest.mark.parametrize("mod", ["train_vae", "train_unet"])
    def test_resume_appends(self, tmp_path, mod):
        import importlib
        import json

        _finish = importlib.import_module(f"icsg3d_tpu.apps.{mod}")._finish
        _finish(self._args(tmp_path, False), [self._entry(2.0)])
        _finish(self._args(tmp_path, True), [self._entry(1.0)])
        with open(tmp_path / "history.json") as f:
            hist = json.load(f)
        assert [h["train"]["loss"] for h in hist] == [2.0, 1.0]

    def test_fresh_run_overwrites(self, tmp_path):
        import json

        from icsg3d_tpu.apps.train_vae import _finish

        _finish(self._args(tmp_path, False), [self._entry(2.0)])
        _finish(self._args(tmp_path, False), [self._entry(1.0)])
        with open(tmp_path / "history.json") as f:
            hist = json.load(f)
        assert [h["train"]["loss"] for h in hist] == [1.0]

    @pytest.mark.parametrize("mod", ["train_vae", "train_unet"])
    def test_crash_resume_truncates_retrained_epochs(self, tmp_path, mod):
        """With --ckpt-every N > 1, a crash can leave `latest` behind the
        history tail; the resumed run re-trains those epochs and must not
        double-count them (ADVICE r4)."""
        import importlib
        import json

        _finish = importlib.import_module(f"icsg3d_tpu.apps.{mod}")._finish
        # first run wrote 3 epochs to history, but crashed after a
        # latest-save at epoch 2: the checkpoint holds 2 epochs
        _finish(self._args(tmp_path, False),
                [self._entry(3.0), self._entry(2.5), self._entry(2.0)])
        args = self._args(tmp_path, True)
        args._resumed_epochs = 2
        # resumed run re-trains epoch 3 (and one more)
        _finish(args, [self._entry(1.9), self._entry(1.5)])
        with open(tmp_path / "history.json") as f:
            hist = json.load(f)
        assert [h["train"]["loss"] for h in hist] == [3.0, 2.5, 1.9, 1.5]

    def test_corrupt_prior_history_is_ignored(self, tmp_path):
        import json

        from icsg3d_tpu.apps.train_vae import _finish

        (tmp_path / "history.json").write_text("{not json")
        _finish(self._args(tmp_path, True), [self._entry(3.0)])
        with open(tmp_path / "history.json") as f:
            hist = json.load(f)
        assert [h["train"]["loss"] for h in hist] == [3.0]
