"""Reconstruction-quality evaluation over the validation split.

Reference: eval.py — for each validation sample, VAE-reconstruct the grid,
U-Net segment, watershed-extract atoms, and compare against ground truth:
EMD between predicted/true atom positions, |delta atom count|, per-axis
lattice-parameter errors.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from icsg3d_tpu.apps import common
from icsg3d_tpu.config import GridSpec, PipelineConfig, UNetConfig, VAEConfig
from icsg3d_tpu.data.binning import bin_and_encode
from icsg3d_tpu.data.splits import data_split
from icsg3d_tpu.data.store import BatchIterator, GridDataset
from icsg3d_tpu.ops.emd import earth_movers_distance
from icsg3d_tpu.ops.grid import to_lattice_params, to_voxel_params
from icsg3d_tpu.ops.segmentation import watershed_clustering


def _sanitize_nonfinite(obj):
    """Replace non-finite floats with None so json.dump emits valid JSON."""
    if isinstance(obj, float):
        return obj if np.isfinite(obj) else None
    if isinstance(obj, dict):
        return {k: _sanitize_nonfinite(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_sanitize_nonfinite(v) for v in obj]
    return obj


def evaluate_reconstructions(
    vae_model,
    vae_vars,
    unet_model,
    unet_vars,
    dataset: GridDataset,
    ids: List[str],
    conds: np.ndarray,
    batch_size: int = 10,
    pipe: PipelineConfig = PipelineConfig(),
    seed: int = 0,
    merge_closer_than: float = 0.0,
) -> Dict:
    """Per-sample EMD / atom-count / lattice errors, means over the split.

    conds: per-id one-hot conditions aligned with ``ids``.
    """
    grid = pipe.grid
    recon_fn = common.jit_vae_reconstruct(vae_model, vae_vars)
    segment = common.jit_unet_segment(
        unet_model, unet_vars, pipe.binary_threshold
    )

    @jax.jit
    def lattice_of(recon):
        # device-side, from the device-resident recon: pulling recon to
        # host and re-shipping it tripled H2D traffic over the tunnel
        l = to_lattice_params(recon[..., 1:], grid)
        return l, to_voxel_params(l, grid)

    # True atoms come from the stored site arrays when the dataset carries
    # them (the reference re-parsed each CIF, eval.py:182-190); otherwise
    # fall back to watershed on the clean ground-truth grids.
    has_sites = "sites" in dataset.arrays and "site_z" in dataset.arrays
    fields = ["density", "coords", "species", "lattice"]
    if has_sites:
        fields += ["sites", "site_z"]
    # Pad the id list to a batch multiple (repeating the tail id) so EVERY
    # sample is evaluated: BatchIterator drops remainders, which silently
    # excluded up to batch_size-1 samples from the reported means (and a
    # split smaller than one batch evaluated nothing at all).
    n_real = len(ids)
    pad = (-n_real) % batch_size
    ids = list(ids) + [ids[-1]] * pad
    conds = np.concatenate([conds, np.repeat(conds[-1:], pad, axis=0)])
    it = BatchIterator(
        dataset, ids, batch_size, fields=tuple(fields),
        extra={"cond": conds},
    )
    key = jax.random.key(seed)
    emds, datoms, dlattice = [], [], []
    l_true_all, l_pred_all = [], []
    n_skipped, first_error = 0, None
    g = 0  # global sample index over the padded id list
    for batch in it:
        x = common.grid_input(batch["density"], batch["coords"])
        key, sub = jax.random.split(key)
        recon_d, _, _ = recon_fn(
            jnp.asarray(x), jnp.asarray(batch["cond"]), sub
        )
        l_pred_d, dv_pred_d = lattice_of(recon_d)
        labels_d, binary_d, _ = segment(recon_d)
        recon = np.asarray(recon_d)
        l_pred = np.asarray(l_pred_d)
        dv_pred = np.asarray(dv_pred_d)
        labels, binary = np.asarray(labels_d), np.asarray(binary_d)

        for i in range(len(recon)):
            g += 1
            if g > n_real:
                break  # padded tail repeats of the last sample
            true_l = batch["lattice"][i][:3]
            # ground-truth atoms from the stored species grid
            S_true = batch["species"][i].astype(int)
            try:
                atoms_p, mu_p = watershed_clustering(
                    recon[i, ..., 0],
                    np.where(binary[i] > 0, labels[i], 0),
                    binary[i],
                    max_iters=pipe.watershed_max_iters,
                    wmin=pipe.watershed_wmin,
                    min_convexity=pipe.watershed_min_convexity,
                )
                # host numpy: per-sample device dispatches for 3-vector
                # math round-trip the tunnel and leak host RAM (CLAUDE.md)
                cart_p = (
                    np.asarray(mu_p) * dv_pred[i]
                    - grid.eps_frac * l_pred[i] + dv_pred[i] / 2.0
                ) if len(mu_p) else np.zeros((0, 3))
                if merge_closer_than > 0 and len(cart_p):
                    from icsg3d_tpu.apps.generate import merge_close_atoms

                    atoms_p, cart_p = merge_close_atoms(
                        np.asarray(atoms_p), cart_p, merge_closer_than
                    )

                if has_sites:
                    zt = batch["site_z"][i]
                    cart_t = batch["sites"][i][zt > 0]
                    n_true = int((zt > 0).sum())
                else:
                    atoms_t, mu_t = watershed_clustering(
                        batch["density"][i], S_true, (S_true > 0).astype(int),
                        max_iters=pipe.watershed_max_iters,
                        wmin=pipe.watershed_wmin,
                        min_convexity=pipe.watershed_min_convexity,
                    )
                    dv_true = np.asarray(true_l, np.float64) * (
                        1.0 + 2.0 * grid.eps_frac
                    ) / grid.d
                    cart_t = (
                        np.asarray(mu_t) * dv_true
                        - grid.eps_frac * np.asarray(true_l) + dv_true / 2.0
                    ) if len(mu_t) else np.zeros((0, 3))
                    n_true = len(atoms_t)
                emds.append(earth_movers_distance(cart_p, cart_t))
                datoms.append(abs(len(atoms_p) - n_true))
            except Exception as e:  # robustness parity (eval.py:193-199)
                n_skipped += 1
                if first_error is None:
                    first_error = repr(e)[:300]
                continue
            dlattice.append(np.abs(l_pred[i] - true_l))
            l_true_all.append(np.asarray(true_l, np.float64))
            l_pred_all.append(np.asarray(l_pred[i], np.float64))

    dlattice = np.asarray(dlattice) if dlattice else np.zeros((0, 3))
    # an EMD is NaN when exactly one of the atom sets is empty (the
    # reference's 0/0); count those separately instead of poisoning the
    # mean
    finite_emds = [e for e in emds if np.isfinite(e)]
    return {
        "mean_emd": (
            float(np.mean(finite_emds)) if finite_emds else float("nan")
        ),
        "n_emd_undefined": len(emds) - len(finite_emds),
        "mean_datoms": float(np.mean(datoms)) if datoms else float("nan"),
        "mean_dlattice": (
            dlattice.mean(axis=0).tolist() if len(dlattice) else [float("nan")] * 3
        ),
        "n_evaluated": len(emds),
        "n_skipped": n_skipped,
        "first_error": first_error,
        "emds": [float(e) for e in emds],
        "datoms": [int(a) for a in datoms],
        "lattice_true": np.asarray(l_true_all).reshape(-1, 3).tolist(),
        "lattice_pred": np.asarray(l_pred_all).reshape(-1, 3).tolist(),
    }


def save_eval_plots(results: Dict, output_dir: str) -> None:
    """Lattice-parameter error histograms and parity scatters plus an EMD
    histogram (reference eval.py:230-322)."""
    import os

    import matplotlib.pyplot as plt

    from icsg3d_tpu import viz

    os.makedirs(output_dir, exist_ok=True)
    lt = np.asarray(results.get("lattice_true", []), np.float64).reshape(-1, 3)
    lp = np.asarray(results.get("lattice_pred", []), np.float64).reshape(-1, 3)
    for ax_i, name in enumerate("abc"):
        if len(lt):
            viz.plot_parity(
                lt[:, ax_i], lp[:, ax_i],
                os.path.join(output_dir, f"parity_{name}.png"), label=name,
            )
            fig, ax = plt.subplots()
            ax.hist(np.abs(lp[:, ax_i] - lt[:, ax_i]), bins=30)
            ax.set_xlabel(f"|error {name}| (Angstrom)")
            ax.set_ylabel("count")
            fig.savefig(os.path.join(output_dir, f"err_hist_{name}.png"), dpi=120)
            plt.close(fig)
    emds = np.asarray(results.get("emds", []), np.float64)
    if len(emds):
        fig, ax = plt.subplots()
        ax.hist(emds[np.isfinite(emds)], bins=30)
        ax.set_xlabel("EMD (Angstrom)")
        ax.set_ylabel("count")
        fig.savefig(os.path.join(output_dir, "emd_hist.png"), dpi=120)
        plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate VAE reconstructions")
    p.add_argument("--data", required=True)
    p.add_argument("--vae-ckpt", required=True)
    p.add_argument("--unet-ckpt", required=True)
    p.add_argument("--batch-size", type=int, default=10)
    p.add_argument("--d", type=int, default=None,
                   help="grid resolution; default: read from the dataset")
    p.add_argument("--num-classes", type=int, default=95)
    p.add_argument("--cond-bins", type=int, default=10)
    common.add_vae_flags(p)
    p.add_argument("--samples", type=int, default=None)
    p.add_argument("--split-frac", type=float, default=0.8,
                   help="MUST match the training run's --split-frac, or "
                        "the 'validation' set overlaps the train split")
    p.add_argument("--output", default=None)
    p.add_argument("--plots", default=None,
                   help="directory for error histograms and parity plots "
                        "(eval.py:230-322)")
    p.add_argument("--binary-threshold", type=float, default=0.8,
                   help="U-Net occupancy (sigmoid) threshold for the "
                        "extraction mask (generate.py:224 default 0.8).  "
                        "At 64³ the head is miscalibrated — 0.9 matches "
                        "the true occupied fraction and halves EMD "
                        "(tools/diag64_binary.py sweep)")
    p.add_argument("--merge-closer-than", type=float, default=0.0,
                   help="merge extracted atoms closer than this many "
                        "Angstrom before scoring (0 = off; see "
                        "apps/generate.py merge_close_atoms)")
    p.add_argument("--eval-split", default="val", choices=("val", "train"),
                   help="which split to reconstruct+evaluate.  'train' is "
                        "a DIAGNOSTIC (never a headline number): comparing "
                        "train-split EMD against val-split EMD separates a "
                        "generalization gap (train much better) from "
                        "model/post-processing saturation (both equal)")
    args = p.parse_args(argv)

    ds = GridDataset(args.data)
    args.d = common.resolve_grid_d(args.d, ds)
    grid = GridSpec(d=args.d)
    pipe = PipelineConfig(grid=grid, cond_bins=args.cond_bins,
                          binary_threshold=args.binary_threshold)
    _, conds, _ = bin_and_encode(np.asarray(ds.arrays["target"]), args.cond_bins)
    # validation split without rotations (eval.py:130-142)
    train_ids, val_ids = data_split(
        ds.ids, n=args.samples, frac=args.split_frac, n_rot=0
    )
    if args.eval_split == "train":
        val_ids = train_ids
    conds_val = conds[[ds.index[sid] for sid in val_ids]]

    vae_model, vae_vars = common.load_vae(
        common.vae_config_from_args(args, grid), args.vae_ckpt
    )
    unet_model, unet_vars = common.load_unet(
        UNetConfig(
            num_classes=args.num_classes,
            layout=args.layout,
        ),
        args.unet_ckpt, grid_d=args.d
    )
    results = evaluate_reconstructions(
        vae_model, vae_vars, unet_model, unet_vars, ds, val_ids, conds_val,
        batch_size=args.batch_size, pipe=pipe,
        merge_closer_than=args.merge_closer_than,
    )
    summary = {
        k: v for k, v in results.items()
        if k in ("mean_emd", "mean_datoms", "mean_dlattice", "n_evaluated",
                 "n_emd_undefined", "n_skipped", "first_error")
    }
    # sanitize stdout too: NaN means (zero evaluated samples) would print
    # non-standard JSON tokens that break `... | jq` consumers
    print(json.dumps(_sanitize_nonfinite(summary), indent=1))
    if args.output:
        with open(args.output, "w") as f:
            # strict-JSON safety: inf/NaN (possible per-sample EMDs on empty
            # prediction sets) would serialize as non-standard tokens
            json.dump(_sanitize_nonfinite(results), f, indent=1)
    if args.plots:
        save_eval_plots(results, args.plots)


if __name__ == "__main__":
    main()
