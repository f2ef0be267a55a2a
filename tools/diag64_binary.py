"""Probe the 64^3 U-Net binary-occupancy head (the diag64_stages culprit).

diag64_stages.json showed: watershed on TRUE labels -> 0.079 A EMD, but
on U-Net output from the SAME true density -> 0.82 A with |dN| 3.75 and
94.7% per-voxel label accuracy.  Since class 0 is weight-zeroed in the
softmax head (the species head never predicts background, by reference
design), the extraction mask comes entirely from the sigmoid binary
head.  This tool measures that head against true occupancy on val
samples and sweeps the binary threshold, reporting IoU / predicted
fraction / watershed EMD per threshold.

  python tools/diag64_binary.py --data data/mix64 \
      --unet-ckpt checkpoints/mix64/unet --n 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--unet-ckpt", required=True)
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-classes", type=int, default=95)
    p.add_argument("--thresholds", default="0.2,0.35,0.5,0.65,0.8,0.9")
    p.add_argument("--out", default="output/ns10k/diag64_binary.json")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from icsg3d_tpu.apps import common
    from icsg3d_tpu.config import GridSpec, PipelineConfig, UNetConfig
    from icsg3d_tpu.data.splits import data_split
    from icsg3d_tpu.data.store import BatchIterator, GridDataset
    from icsg3d_tpu.ops.emd import earth_movers_distance
    from icsg3d_tpu.ops.segmentation import watershed_clustering

    ds = GridDataset(args.data)
    d = ds.arrays["density"].shape[-1]
    grid = GridSpec(d=d)
    pipe = PipelineConfig(grid=grid)
    _, val_ids = data_split(ds.ids, n=None, frac=0.8, n_rot=0)
    val_ids = val_ids[: args.n]

    unet_model, unet_vars = common.load_unet(
        UNetConfig(num_classes=args.num_classes), args.unet_ckpt, grid_d=d
    )

    @jax.jit
    def heads(x):
        soft, sig = unet_model.apply(unet_vars, x, train=False)
        return jnp.argmax(soft, axis=-1), jax.nn.sigmoid(sig[..., 0])

    thresholds = [float(t) for t in args.thresholds.split(",")]
    stats = {f"t={t}": {"iou": [], "pred_frac": [], "emds": [], "datoms": []}
             for t in thresholds}
    occ_fracs = []

    def cart_from_voxel(mu, l):
        dv = np.asarray(l, np.float64) * (1 + 2 * grid.eps_frac) / grid.d
        if not len(mu):
            return np.zeros((0, 3))
        return np.asarray(mu) * dv - grid.eps_frac * np.asarray(l) + dv / 2

    it = BatchIterator(
        ds, val_ids, args.batch_size,
        fields=("density", "coords", "species", "lattice", "sites", "site_z"),
    )
    for batch in it:
        x = common.grid_input(batch["density"], batch["coords"])
        lab_d, prob_d = heads(jnp.asarray(x))
        lab, prob = np.asarray(lab_d), np.asarray(prob_d)
        for i in range(len(x)):
            S = batch["species"][i].astype(int)
            occ = S > 0
            occ_fracs.append(float(occ.mean()))
            zt = batch["site_z"][i]
            cart_t = batch["sites"][i][zt > 0]
            n_true = int((zt > 0).sum())
            l_true = batch["lattice"][i][:3]
            for t in thresholds:
                b = prob[i] > t
                inter = (b & occ).sum()
                union = (b | occ).sum()
                s = stats[f"t={t}"]
                s["iou"].append(float(inter / max(union, 1)))
                s["pred_frac"].append(float(b.mean()))
                try:
                    atoms, mu = watershed_clustering(
                        batch["density"][i],
                        np.where(b, lab[i], 0), b.astype(int),
                        max_iters=pipe.watershed_max_iters,
                        wmin=pipe.watershed_wmin,
                        min_convexity=pipe.watershed_min_convexity,
                    )
                    e = earth_movers_distance(
                        cart_from_voxel(mu, l_true), cart_t)
                    s["emds"].append(float(e))
                    s["datoms"].append(abs(len(atoms) - n_true))
                except Exception as ex:  # noqa: BLE001
                    s.setdefault("errors", []).append(repr(ex)[:120])

    out = {"true_occupied_fraction": float(np.mean(occ_fracs))}
    for k, s in stats.items():
        emds = [e for e in s["emds"] if np.isfinite(e)]
        out[k] = {
            "mean_iou": float(np.mean(s["iou"])),
            "mean_pred_frac": float(np.mean(s["pred_frac"])),
            "mean_emd": float(np.mean(emds)) if emds else None,
            "n_emd_undefined": len(s["emds"]) - len(emds),
            "mean_datoms": float(np.mean(s["datoms"])) if s["datoms"] else None,
            "n_errors": len(s.get("errors", [])),
        }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
