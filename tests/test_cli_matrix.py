"""Smoke-level invocations of every documented CLI flag combination.

VERDICT r4 item 8: the realcif campaign found a documented invocation
form (`train_cgcnn --cifs/--targets-csv`) that had never been executed
before a live campaign hit it (rc=2 on a nonexistent flag).  This file
runs each README.md / MIGRATION.md-documented invocation form of the 8
CLIs in-process on tiny data (d=8, 1 epoch) so an argument-matrix
regression fails CI, not a hardware campaign.

Stage outputs chain through module-scoped fixtures (dataset ->
unet ckpt -> vae ckpt -> cgcnn ckpt -> generated structures) exactly as
the reference's pipeline ordering requires (README.md:68-108).
"""

from __future__ import annotations

import csv
import json
import os

import numpy as np
import pytest

from icsg3d_tpu.apps import (
    evaluate as app_evaluate,
    generate as app_generate,
    interpolate as app_interpolate,
    predict as app_predict,
    query as app_query,
    train_cgcnn as app_train_cgcnn,
    train_unet as app_train_unet,
    train_vae as app_train_vae,
    view as app_view,
    voxelize as app_voxelize,
)
from icsg3d_tpu.data.store import GridDataset

D = 8
BS = 8  # divisible by the 8 virtual CPU devices (conftest mesh)
NCLS = 60
VAE_GEOM = ["--filters", "4,8", "--latent", "8"]


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    return tmp_path_factory.mktemp("cli_matrix")


@pytest.fixture(scope="module")
def dataset(ws):
    """README form: voxelize --synthetic N --out data/synth --d 8."""
    out = str(ws / "synth")
    app_voxelize.main([
        "--synthetic", "40", "--out", out, "--d", str(D), "--nrot", "0",
        "--kinds", "perovskite,rocksalt", "--seed", "0",
    ])
    ds = GridDataset(out)
    assert len(ds) == 40
    return out


@pytest.fixture(scope="module")
def cif_corpus(ws):
    """A tiny CIF dir + targets CSV (reference data/<name>/ layout)."""
    from icsg3d_tpu.crystal.cif import write_cif
    from icsg3d_tpu.data.synthetic import random_structures

    cif_dir = ws / "cifs"
    cif_dir.mkdir()
    structures = random_structures(10, seed=3,
                                   kinds=("perovskite", "rocksalt"))
    rows = []
    for i, s in enumerate(structures):
        sid = f"mp-{i}"
        write_cif(s, str(cif_dir / f"{sid}.cif"), name=sid)
        rows.append({"task_id": sid,
                     "formation_energy_per_atom": -1.0 - 0.1 * i})
    csv_path = ws / "targets.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    return str(cif_dir), str(csv_path)


@pytest.fixture(scope="module")
def unet_ckpt(ws, dataset):
    """MIGRATION form: train_unet --data --samples --epochs --batch-size
    --lr --ckpt."""
    ckpt = str(ws / "ckpt_unet")
    app_train_unet.main([
        "--data", dataset, "--samples", "40", "--epochs", "1",
        "--batch-size", str(BS), "--lr", "3e-6", "--nrot", "0",
        "--num-classes", str(NCLS), "--ckpt", ckpt,
    ])
    assert os.path.isdir(os.path.join(ckpt, "best"))
    assert os.path.exists(os.path.join(ckpt, "class_weights.json"))
    return ckpt


@pytest.fixture(scope="module")
def vae_ckpt(ws, dataset, unet_ckpt):
    """MIGRATION form: train_vae --data --samples --epochs --batch-size
    --unet-ckpt --ckpt."""
    ckpt = str(ws / "ckpt_vae")
    app_train_vae.main([
        "--data", dataset, "--samples", "40", "--epochs", "1",
        "--batch-size", str(BS), "--unet-ckpt", unet_ckpt, "--ckpt", ckpt,
        "--nrot", "0", "--num-classes", str(NCLS),
        "--filters", "4,8", "--latent", "8",
    ])
    assert os.path.isdir(os.path.join(ckpt, "best"))
    return ckpt


@pytest.fixture(scope="module")
def cgcnn_ckpt(ws):
    """README form: train_cgcnn --synthetic 1000 --ckpt."""
    ckpt = str(ws / "ckpt_cgcnn")
    app_train_cgcnn.main([
        "--synthetic", "40", "--epochs", "1", "--batch-size", str(BS),
        "--ckpt", ckpt,
    ])
    assert os.path.isdir(os.path.join(ckpt, "best"))
    return ckpt


# ---------------------------------------------------------------------------
# voxelize
# ---------------------------------------------------------------------------


def test_voxelize_from_cifs_with_rotations(ws, cif_corpus):
    """MIGRATION form: voxelize --cifs --targets-csv --out --d --nrot."""
    cif_dir, csv_path = cif_corpus
    out = str(ws / "from_cifs")
    app_voxelize.main([
        "--cifs", cif_dir, "--targets-csv", csv_path,
        "--target", "formation_energy_per_atom",
        "--out", out, "--d", str(D), "--nrot", "1", "--sigma-frac", "1.0",
    ])
    ds = GridDataset(out)
    assert len(ds) == 20  # 10 base + 1 rotation each
    assert any("_rot_" in i for i in ds.ids)


# ---------------------------------------------------------------------------
# train_unet variants
# ---------------------------------------------------------------------------


def test_train_unet_resume(dataset, unet_ckpt):
    """MIGRATION: --resume continues from ckpt/latest."""
    app_train_unet.main([
        "--data", dataset, "--epochs", "1", "--batch-size", str(BS),
        "--nrot", "0", "--num-classes", str(NCLS), "--ckpt", unet_ckpt,
        "--resume",
    ])
    with open(os.path.join(unet_ckpt, "history.json")) as f:
        assert len(json.load(f)) == 2  # appended, not overwritten


def test_train_unet_no_class_weights(ws, dataset):
    """MIGRATION: --no-class-weights restores reference-bug behavior."""
    ckpt = str(ws / "ckpt_unet_ncw")
    app_train_unet.main([
        "--data", dataset, "--epochs", "1", "--batch-size", str(BS),
        "--nrot", "0", "--num-classes", str(NCLS), "--ckpt", ckpt,
        "--no-class-weights",
    ])
    with open(os.path.join(ckpt, "class_weights.json")) as f:
        assert json.load(f)["class_weights"] is None


def test_train_unet_resident_epoch_scan(ws, dataset):
    """CLAUDE.md production mode: --resident --epoch-scan --ship-dtype."""
    ckpt = str(ws / "ckpt_unet_scan")
    app_train_unet.main([
        "--data", dataset, "--epochs", "1", "--batch-size", str(BS),
        "--nrot", "0", "--num-classes", str(NCLS), "--ckpt", ckpt,
        "--resident", "--epoch-scan", "--ship-dtype", "float16",
        "--ckpt-every", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt, "best"))


# ---------------------------------------------------------------------------
# train_vae variants
# ---------------------------------------------------------------------------


def test_train_vae_parity_and_floor_flags(ws, dataset, unet_ckpt):
    """MIGRATION: --cond-repeat 4 (reference-parity condition width),
    --alpha/--beta, and the --kld-floor free-bits extension."""
    ckpt = str(ws / "ckpt_vae_fb")
    app_train_vae.main([
        "--data", dataset, "--epochs", "1", "--batch-size", str(BS),
        "--unet-ckpt", unet_ckpt, "--ckpt", ckpt, "--nrot", "0",
        "--num-classes", str(NCLS), "--filters", "4,8", "--latent", "8",
        "--cond-repeat", "4", "--alpha", "0.5", "--beta", "3e-4",
        "--kld-floor", "5",
    ])
    assert os.path.isdir(os.path.join(ckpt, "best"))


def test_train_vae_resume(dataset, unet_ckpt, vae_ckpt):
    app_train_vae.main([
        "--data", dataset, "--epochs", "1", "--batch-size", str(BS),
        "--unet-ckpt", unet_ckpt, "--ckpt", vae_ckpt, "--nrot", "0",
        "--num-classes", str(NCLS), "--filters", "4,8", "--latent", "8",
        "--resume",
    ])
    with open(os.path.join(vae_ckpt, "history.json")) as f:
        assert len(json.load(f)) >= 2


def test_train_vae_resident_scan_cached(ws, dataset, unet_ckpt):
    """CLAUDE.md production mode: --resident --epoch-scan
    --cache-true-features in one invocation."""
    ckpt = str(ws / "ckpt_vae_scan")
    app_train_vae.main([
        "--data", dataset, "--epochs", "1", "--batch-size", str(BS),
        "--unet-ckpt", unet_ckpt, "--ckpt", ckpt, "--nrot", "0",
        "--num-classes", str(NCLS), "--filters", "4,8", "--latent", "8",
        "--resident", "--epoch-scan", "--cache-true-features",
        "--ship-dtype", "float16", "--ckpt-every", "1", "--plot-every", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt, "best"))


# ---------------------------------------------------------------------------
# train_cgcnn variants
# ---------------------------------------------------------------------------


def test_train_cgcnn_from_cifs(ws, cif_corpus):
    """MIGRATION form that failed in the r4 campaign: train_cgcnn
    --cifs --targets-csv --target --ckpt."""
    cif_dir, csv_path = cif_corpus
    ckpt = str(ws / "ckpt_cgcnn_cif")
    app_train_cgcnn.main([
        "--cifs", cif_dir, "--targets-csv", csv_path,
        "--target", "formation_energy_per_atom",
        "--epochs", "1", "--batch-size", str(BS), "--ckpt", ckpt,
    ])
    assert os.path.isdir(os.path.join(ckpt, "best"))


def test_train_cgcnn_resume_and_band_gap(ws, cgcnn_ckpt):
    app_train_cgcnn.main([
        "--synthetic", "40", "--epochs", "1", "--batch-size", str(BS),
        "--ckpt", cgcnn_ckpt, "--resume",
    ])
    ckpt_bg = str(ws / "ckpt_cgcnn_bg")
    app_train_cgcnn.main([
        "--synthetic", "40", "--epochs", "1", "--batch-size", str(BS),
        "--synthetic-property", "band_gap", "--ckpt", ckpt_bg,
    ])
    assert os.path.isdir(os.path.join(ckpt_bg, "best"))


# ---------------------------------------------------------------------------
# generate
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def generated(ws, dataset, vae_ckpt, unet_ckpt, cgcnn_ckpt):
    """MIGRATION form: generate --data --base --nsamples --var --vae-ckpt
    --unet-ckpt --cgcnn-ckpt name=dir --output."""
    base = GridDataset(dataset).ids[0]
    out = str(ws / "gen")
    app_generate.main([
        "--data", dataset, "--base", base, "--nsamples", str(BS),
        "--batch-size", str(BS), "--var", "0.5",
        "--vae-ckpt", vae_ckpt, "--unet-ckpt", unet_ckpt,
        "--cgcnn-ckpt", f"formation_energy_per_atom={cgcnn_ckpt}",
        "--num-classes", str(NCLS), *VAE_GEOM,
        "--output", out, "--seed", "0",
    ])
    assert os.path.exists(os.path.join(out, "results.json"))
    assert os.path.exists(os.path.join(out, "results.csv"))
    return out


def test_generate_host_path(generated):
    with open(os.path.join(generated, "results.json")) as f:
        records = json.load(f)
    assert len(records) == BS


def test_generate_fused(ws, dataset, vae_ckpt, unet_ckpt):
    """MIGRATION: --fused single-XLA-program path (no CGCNN annotate)."""
    base = GridDataset(dataset).ids[0]
    out = str(ws / "gen_fused")
    app_generate.main([
        "--data", dataset, "--base", base, "--nsamples", str(BS),
        "--batch-size", str(BS), "--var", "0.5",
        "--vae-ckpt", vae_ckpt, "--unet-ckpt", unet_ckpt,
        "--num-classes", str(NCLS), *VAE_GEOM,
        "--output", out, "--fused", "--binary-threshold", "0.6",
    ])
    assert os.path.exists(os.path.join(out, "results.json"))


def test_generate_save_grids(ws, dataset, vae_ckpt, unet_ckpt):
    """MIGRATION: --save-grids keeps decoded grids (host path only)."""
    base = GridDataset(dataset).ids[0]
    out = str(ws / "gen_grids")
    app_generate.main([
        "--data", dataset, "--base", base, "--nsamples", "8",
        "--batch-size", str(BS), "--vae-ckpt", vae_ckpt,
        "--unet-ckpt", unet_ckpt, "--num-classes", str(NCLS), *VAE_GEOM,
        "--output", out, "--save-grids", "--merge-closer-than", "0.7",
    ])
    grids = os.path.join(out, "grids")
    assert os.path.isdir(grids)
    assert any(f.endswith(".npy") for f in os.listdir(grids)), (
        os.listdir(grids))


def test_generate_merge_sweep(ws, dataset, vae_ckpt, unet_ckpt):
    """--merge-closer-than comma list: one decode, per-cutoff records.

    Primary fields use the first cutoff; every extra cutoff lands in
    by_cutoff with its own atoms/valid/charge_balanced, and its valid
    structures get their own cifs/m<cutoff>/ directory."""
    base = GridDataset(dataset).ids[0]
    out = str(ws / "gen_sweep")
    app_generate.main([
        "--data", dataset, "--base", base, "--nsamples", "8",
        "--batch-size", str(BS), "--vae-ckpt", vae_ckpt,
        "--unet-ckpt", unet_ckpt, "--num-classes", str(NCLS), *VAE_GEOM,
        "--output", out, "--merge-closer-than", "0,0.7",
    ])
    assert os.path.isdir(os.path.join(out, "cifs", "m0.7"))
    with open(os.path.join(out, "results.json")) as f:
        records = json.load(f)
    swept = [r for r in records if r.get("by_cutoff")]
    for r in swept:
        assert set(r["by_cutoff"]) == {"0", "0.7"}
        # the 0-cutoff entry mirrors the primary (first-cutoff) fields
        assert r["by_cutoff"]["0"]["atoms"] == r["atoms"]
        assert "structure" not in r["by_cutoff"]["0.7"]  # JSON-clean
        # merging can only reduce (or keep) the atom count
        assert (len(r["by_cutoff"]["0.7"]["atoms"])
                <= len(r["by_cutoff"]["0"]["atoms"]))


# ---------------------------------------------------------------------------
# evaluate
# ---------------------------------------------------------------------------


def test_evaluate_with_plots(ws, dataset, vae_ckpt, unet_ckpt):
    """MIGRATION form: evaluate --data --vae-ckpt --unet-ckpt --output
    --plots."""
    out = str(ws / "eval.json")
    plots = str(ws / "eval_plots")
    app_evaluate.main([
        "--data", dataset, "--vae-ckpt", vae_ckpt, "--unet-ckpt", unet_ckpt,
        "--batch-size", str(BS), "--num-classes", str(NCLS), *VAE_GEOM,
        "--output", out, "--plots", plots,
    ])
    with open(out) as f:
        res = json.load(f)
    assert "mean_emd" in res
    assert os.path.isdir(plots) and os.listdir(plots)


def test_evaluate_train_split_diagnostic(ws, dataset, vae_ckpt, unet_ckpt):
    """Documented diagnostic: evaluate --eval-split train."""
    out = str(ws / "eval_train.json")
    app_evaluate.main([
        "--data", dataset, "--vae-ckpt", vae_ckpt, "--unet-ckpt", unet_ckpt,
        "--batch-size", str(BS), "--num-classes", str(NCLS), *VAE_GEOM,
        "--eval-split", "train", "--samples", "16", "--output", out,
        "--binary-threshold", "0.6",
    ])
    assert os.path.exists(out)


def test_evaluate_merge_closer_than(ws, dataset, vae_ckpt, unet_ckpt):
    """Documented form: evaluate --merge-closer-than collapses watershed
    split artifacts before the EMD assignment; a large cutoff can only
    reduce (or keep) the predicted atom count, so |Δatoms| vs the
    merge-free run shifts toward fewer predicted atoms."""
    out = str(ws / "eval_merge.json")
    app_evaluate.main([
        "--data", dataset, "--vae-ckpt", vae_ckpt, "--unet-ckpt", unet_ckpt,
        "--batch-size", str(BS), "--num-classes", str(NCLS), *VAE_GEOM,
        "--samples", "16", "--output", out,
        "--merge-closer-than", "0.7",
    ])
    with open(out) as f:
        res = json.load(f)
    assert "mean_emd" in res and res["n_evaluated"] > 0


# ---------------------------------------------------------------------------
# interpolate / view
# ---------------------------------------------------------------------------


def test_interpolate_pair(ws, dataset, vae_ckpt):
    """MIGRATION form: interpolate --data --vae-ckpt --a --b."""
    ids = GridDataset(dataset).ids
    out = str(ws / "interp")
    app_interpolate.main([
        "--data", dataset, "--vae-ckpt", vae_ckpt,
        "--a", ids[0], "--b", ids[1], "--ninterps", "3", *VAE_GEOM,
        "--output", out,
    ])
    assert os.path.isdir(out) and os.listdir(out)


def test_interpolate_sweep_voxels(ws, dataset, vae_ckpt):
    """README form: interpolate --sweep-conds (+ --voxels 3D mode)."""
    out = str(ws / "interp_sweep")
    app_interpolate.main([
        "--data", dataset, "--vae-ckpt", vae_ckpt, "--sweep-conds",
        "--ninterps", "3", *VAE_GEOM, "--voxels", "--output", out,
    ])
    assert os.path.isdir(out) and os.listdir(out)


def test_view(ws, dataset, vae_ckpt, unet_ckpt):
    """MIGRATION form: view --data --vae-ckpt --unet-ckpt --n --output."""
    out = str(ws / "view")
    app_view.main([
        "--data", dataset, "--vae-ckpt", vae_ckpt, "--unet-ckpt", unet_ckpt,
        "--n", "2", "--num-classes", str(NCLS), *VAE_GEOM, "--output", out,
    ])
    assert os.path.isdir(out) and os.listdir(out)


# ---------------------------------------------------------------------------
# predict / query
# ---------------------------------------------------------------------------


def test_predict_on_dir(ws, cif_corpus, cgcnn_ckpt):
    """MIGRATION form: predict --ckpt name=dir <dir-of-cifs> --output."""
    cif_dir, _ = cif_corpus
    out = str(ws / "pred.json")
    app_predict.main([
        "--ckpt", f"formation_energy_per_atom={cgcnn_ckpt}",
        cif_dir, "--batch-size", str(BS), "--output", out,
    ])
    with open(out) as f:
        records = json.load(f)
    assert len(records) == 10
    assert all("formation_energy_per_atom" in r["properties"]
               or "formation_energy_per_atom" in r for r in records)


def test_query_from_json_main(ws):
    """README form: query --from-json dump.json --name X (main argv path;
    run_query itself is covered in test_apps.py)."""
    docs = [{"task_id": "mp-9", "pretty_formula": "NaCl",
             "formation_energy_per_atom": -2.0, "cif": "data_mp-9\n",
             "nsites": 2}]
    dump = ws / "dump.json"
    with open(dump, "w") as f:
        json.dump(docs, f)
    out = str(ws / "query_out")
    try:
        app_query.main([
            "--from-json", str(dump), "--name", "demo", "--out", out,
        ])
    except SystemExit as e:  # query.main exits with the run_query rc
        assert e.code in (0, None)
    assert os.path.exists(os.path.join(out, "demo", "cifs", "mp-9.cif"))
    assert os.path.exists(os.path.join(out, "demo", "demo.csv"))
