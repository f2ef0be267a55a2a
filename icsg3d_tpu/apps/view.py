"""Pipeline inspector: per-sample truth-vs-reconstruction panels.

Reference: view_results.py — for validation samples, run ground truth and
the VAE reconstruction through U-Net + watershed and save comparison plots
with per-sample MSE/F1 (view_results.py:114-189).  Non-interactive (saves
PNGs; the reference popped matplotlib windows).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from icsg3d_tpu import viz
from icsg3d_tpu.apps import common
from icsg3d_tpu.config import GridSpec, PipelineConfig, UNetConfig, VAEConfig
from icsg3d_tpu.data.binning import bin_and_encode
from icsg3d_tpu.data.splits import data_split
from icsg3d_tpu.data.store import GridDataset
from icsg3d_tpu.ops.metrics import f1_score_from_labels
from icsg3d_tpu.ops.segmentation import watershed_clustering


def view_samples(
    vae_model,
    vae_vars,
    unet_model,
    unet_vars,
    dataset: GridDataset,
    sample_ids,
    conds: np.ndarray,
    output: str,
    pipe: PipelineConfig,
    voxels: bool = False,
    seed: int = 0,
) -> list[dict]:
    """Render truth-vs-reconstruction panels for each sample id.

    Returns one record per sample: {"id", "mse", "f1"}; saves
    <id>_recon / _true_species / _pred_species / _regions (and optionally
    _voxels) PNGs under ``output``.
    """
    recon_fn = common.jit_vae_reconstruct(vae_model, vae_vars)
    segment = common.jit_unet_segment(
        unet_model, unet_vars, pipe.binary_threshold
    )

    os.makedirs(output, exist_ok=True)
    key = jax.random.key(seed)
    records = []
    for sid in sample_ids:
        row = dataset.index[sid]
        x = common.grid_input(
            np.asarray(dataset.arrays["density"][row])[None],
            np.asarray(dataset.arrays["coords"][row])[None],
        )
        cond = conds[row][None]
        key, sub = jax.random.split(key)
        recon, _, _ = recon_fn(jnp.asarray(x), jnp.asarray(cond), sub)
        recon = np.asarray(recon)
        mse = float(np.mean((x - recon) ** 2))

        labels_j, binary_j, probs = segment(jnp.asarray(recon))
        labels, binary = np.asarray(labels_j)[0], np.asarray(binary_j)[0]

        # Per-sample F1 of the reconstruction's segmentation against the
        # true species grid (view_results.py:137), clipped to the model's
        # class range like prepare_unet_batch (gather would silently clamp).
        num_classes = probs.shape[-1]
        true_species = np.minimum(
            np.asarray(dataset.arrays["species"][row]).astype(np.int32),
            num_classes - 1,
        )
        f1 = float(
            f1_score_from_labels(jnp.asarray(true_species)[None], probs)
        )

        viz.plot_real_vs_pred(
            x[0], recon[0], os.path.join(output, f"{sid}_recon.png")
        )
        viz.plot_points_3d(
            true_species, os.path.join(output, f"{sid}_true_species.png")
        )
        viz.plot_points_3d(
            np.where(binary > 0, labels, 0),
            os.path.join(output, f"{sid}_pred_species.png"),
        )
        if voxels:
            viz.plot_voxels_duo(
                x[0, ..., 0], recon[0, ..., 0],
                os.path.join(output, f"{sid}_voxels.png"),
            )
        try:
            _, _, R = watershed_clustering(
                recon[0, ..., 0], np.where(binary > 0, labels, 0), binary,
                return_regions=True,
            )
            viz.plot_points_3d(R, os.path.join(output, f"{sid}_regions.png"))
        except Exception:
            pass
        print(f"{sid}: mse {mse:.5f} f1 {f1:.4f}")
        records.append({"id": sid, "mse": mse, "f1": f1})
    return records


def main(argv=None):
    p = argparse.ArgumentParser(description="Inspect pipeline results")
    p.add_argument("--data", required=True)
    p.add_argument("--vae-ckpt", required=True)
    p.add_argument("--unet-ckpt", required=True)
    p.add_argument("--n", type=int, default=5)
    p.add_argument("--split-frac", type=float, default=0.8,
                   help="MUST match the training run's --split-frac, or "
                        "the 'validation' samples overlap the train split")
    p.add_argument("--d", type=int, default=None,
                   help="grid resolution; default: read from the dataset")
    p.add_argument("--num-classes", type=int, default=95)
    p.add_argument("--cond-bins", type=int, default=10)
    common.add_vae_flags(p)
    p.add_argument("--output", default="output/view")
    p.add_argument(
        "--voxels", action="store_true",
        help="also save exploded 3D voxel renders (slow; view_results.py panels)",
    )
    args = p.parse_args(argv)

    ds = GridDataset(args.data)
    args.d = common.resolve_grid_d(args.d, ds)
    grid = GridSpec(d=args.d)
    pipe = PipelineConfig(grid=grid)
    _, conds, _ = bin_and_encode(np.asarray(ds.arrays["target"]), args.cond_bins)
    _, val_ids = data_split(ds.ids, frac=args.split_frac, n_rot=0)

    vae_model, vae_vars = common.load_vae(
        common.vae_config_from_args(args, grid), args.vae_ckpt
    )
    unet_model, unet_vars = common.load_unet(
        UNetConfig(
            num_classes=args.num_classes,
            layout=getattr(args, "layout", "ndhwc"),
        ),
        args.unet_ckpt, grid_d=args.d
    )
    view_samples(
        vae_model, vae_vars, unet_model, unet_vars,
        ds, val_ids[: args.n], conds, args.output, pipe, voxels=args.voxels,
    )


if __name__ == "__main__":
    main()
