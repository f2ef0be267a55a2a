"""Pipeline inspector: per-sample truth-vs-reconstruction panels.

Reference: view_results.py — for validation samples, run ground truth and
the VAE reconstruction through U-Net + watershed and save comparison plots
with per-sample MSE/F1.  Non-interactive (saves PNGs; the reference popped
matplotlib windows).
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
from icsg3d_tpu.ops.segmentation import watershed_clustering


def main(argv=None):
    p = argparse.ArgumentParser(description="Inspect pipeline results")
    p.add_argument("--data", required=True)
    p.add_argument("--vae-ckpt", required=True)
    p.add_argument("--unet-ckpt", required=True)
    p.add_argument("--n", type=int, default=5)
    p.add_argument("--d", type=int, default=32)
    p.add_argument("--num-classes", type=int, default=95)
    p.add_argument("--cond-bins", type=int, default=10)
    p.add_argument("--output", default="output/view")
    args = p.parse_args(argv)

    grid = GridSpec(d=args.d)
    pipe = PipelineConfig(grid=grid)
    ds = GridDataset(args.data)
    _, conds, _ = bin_and_encode(np.asarray(ds.arrays["target"]), args.cond_bins)
    _, val_ids = data_split(ds.ids, n_rot=0)

    vae_model, vae_vars = common.load_vae(
        VAEConfig(grid=grid, cond_bins=args.cond_bins), args.vae_ckpt
    )
    unet_model, unet_vars = common.load_unet(
        UNetConfig(num_classes=args.num_classes), args.unet_ckpt, grid_d=args.d
    )
    recon_fn = common.jit_vae_reconstruct(vae_model, vae_vars)
    segment = common.jit_unet_segment(unet_model, unet_vars, pipe.binary_threshold)

    os.makedirs(args.output, exist_ok=True)
    key = jax.random.key(0)
    for sid in val_ids[: args.n]:
        row = ds.index[sid]
        x = common.grid_input(
            np.asarray(ds.arrays["density"][row])[None],
            np.asarray(ds.arrays["coords"][row])[None],
        )
        cond = conds[row][None]
        key, sub = jax.random.split(key)
        recon, _, _ = recon_fn(jnp.asarray(x), jnp.asarray(cond), sub)
        recon = np.asarray(recon)
        mse = float(np.mean((x - recon) ** 2))

        labels, binary, _ = segment(jnp.asarray(recon))
        labels, binary = np.asarray(labels)[0], np.asarray(binary)[0]

        viz.plot_real_vs_pred(x[0], recon[0], os.path.join(args.output, f"{sid}_recon.png"))
        try:
            _, _, R = watershed_clustering(
                recon[0, ..., 0], np.where(binary > 0, labels, 0), binary,
                return_regions=True,
            )
            viz.plot_points_3d(R, os.path.join(args.output, f"{sid}_regions.png"))
        except Exception:
            pass
        print(f"{sid}: mse {mse:.5f}")


if __name__ == "__main__":
    main()
