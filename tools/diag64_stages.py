"""Stage-isolation diagnostic for the 64^3 quality saturation.

The eval64 train-split diagnostic (VERDICT r4 item 4) showed train EMD
(0.756 A) ~= val EMD (0.730 A): no generalization gap, so the pipeline
saturates.  This tool decomposes WHERE, over the same val samples:

  A. oracle-density path: TRUE density+coords -> U-Net segment ->
     watershed -> EMD vs true sites.        (U-Net + extraction, no VAE)
  B. oracle-segmentation path: TRUE density, TRUE species labels ->
     watershed -> EMD.                      (extraction alone)
  C. full recon path (same math as apps/evaluate.py) for reference.

Reading: B small, A large  -> the U-Net at 64^3 is the bottleneck.
         B large           -> watershed/extraction at 64^3 is broken.
         A small, C large  -> the VAE reconstruction saturates.

  python tools/diag64_stages.py --data data/mix64 \
      --vae-ckpt checkpoints/mix64/vae --unet-ckpt checkpoints/mix64/unet \
      --n 64 --out output/ns10k/diag64_stages.json
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
    p.add_argument("--vae-ckpt", required=True)
    p.add_argument("--unet-ckpt", required=True)
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-classes", type=int, default=95)
    p.add_argument("--out", default="output/ns10k/diag64_stages.json")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from icsg3d_tpu.apps import common
    from icsg3d_tpu.config import GridSpec, PipelineConfig, UNetConfig, VAEConfig
    from icsg3d_tpu.data.binning import bin_and_encode
    from icsg3d_tpu.data.splits import data_split
    from icsg3d_tpu.data.store import BatchIterator, GridDataset
    from icsg3d_tpu.ops.emd import earth_movers_distance
    from icsg3d_tpu.ops.segmentation import watershed_clustering

    ds = GridDataset(args.data)
    d = ds.arrays["density"].shape[-1]
    grid = GridSpec(d=d)
    pipe = PipelineConfig(grid=grid)
    _, conds, _ = bin_and_encode(np.asarray(ds.arrays["target"]), 10)
    _, val_ids = data_split(ds.ids, n=None, frac=0.8, n_rot=0)
    val_ids = val_ids[: args.n]
    conds_val = conds[[ds.index[i] for i in val_ids]]

    vae_model, vae_vars = common.load_vae(
        VAEConfig(grid=grid), args.vae_ckpt
    )
    unet_model, unet_vars = common.load_unet(
        UNetConfig(num_classes=args.num_classes), args.unet_ckpt, grid_d=d
    )
    recon_fn = common.jit_vae_reconstruct(vae_model, vae_vars)
    segment = common.jit_unet_segment(
        unet_model, unet_vars, pipe.binary_threshold
    )

    def cart_from_voxel(mu, l):
        dv = np.asarray(l, np.float64) * (1 + 2 * grid.eps_frac) / grid.d
        if not len(mu):
            return np.zeros((0, 3))
        return np.asarray(mu) * dv - grid.eps_frac * np.asarray(l) + dv / 2

    def ws(density, labels, binary):
        return watershed_clustering(
            density, labels, binary,
            max_iters=pipe.watershed_max_iters, wmin=pipe.watershed_wmin,
            min_convexity=pipe.watershed_min_convexity,
        )

    res = {k: {"emds": [], "datoms": [], "wrec": []}
           for k in ("A_true_density_unet", "B_true_labels", "C_recon")}
    it = BatchIterator(
        ds, val_ids, args.batch_size,
        fields=("density", "coords", "species", "lattice", "sites", "site_z"),
        extra={"cond": conds_val},
    )
    key = jax.random.key(0)
    for batch in it:
        x = common.grid_input(batch["density"], batch["coords"])
        # A: true grids through the U-Net
        la_d, ba_d, _ = segment(jnp.asarray(x))
        # C: recon through the U-Net
        key, sub = jax.random.split(key)
        recon_d, _, _ = recon_fn(jnp.asarray(x), jnp.asarray(batch["cond"]),
                                 sub)
        lc_d, bc_d, _ = segment(recon_d)
        la, ba = np.asarray(la_d), np.asarray(ba_d)
        lc, bc = np.asarray(lc_d), np.asarray(bc_d)
        recon = np.asarray(recon_d)

        for i in range(len(x)):
            l_true = batch["lattice"][i][:3]
            zt = batch["site_z"][i]
            cart_t = batch["sites"][i][zt > 0]
            n_true = int((zt > 0).sum())
            S = batch["species"][i].astype(int)
            M = batch["density"][i]
            occ = S > 0
            for name, dens, labels, binary in (
                ("A_true_density_unet", M,
                 np.where(ba[i] > 0, la[i], 0), ba[i]),
                ("B_true_labels", M, S, occ.astype(int)),
                ("C_recon", recon[i, ..., 0],
                 np.where(bc[i] > 0, lc[i], 0), bc[i]),
            ):
                try:
                    atoms, mu = ws(dens, labels, binary)
                    cart_p = cart_from_voxel(mu, l_true)
                    e = earth_movers_distance(cart_p, cart_t)
                    res[name]["emds"].append(float(e))
                    res[name]["datoms"].append(abs(len(atoms) - n_true))
                except Exception as ex:  # noqa: BLE001
                    res[name].setdefault("errors", []).append(repr(ex)[:120])
            # U-Net label accuracy on occupied voxels (weighted recall
            # analog, on argmax labels): from true grids
            if occ.any():
                res["A_true_density_unet"]["wrec"].append(
                    float((la[i][occ] == S[occ]).mean())
                )

    out = {}
    for name, r in res.items():
        emds = [e for e in r["emds"] if np.isfinite(e)]
        out[name] = {
            "mean_emd": float(np.mean(emds)) if emds else None,
            "n_emd_undefined": len(r["emds"]) - len(emds),
            "mean_datoms": (float(np.mean(r["datoms"]))
                            if r["datoms"] else None),
            "n": len(r["emds"]),
            "n_errors": len(r.get("errors", [])),
            "first_error": r.get("errors", [None])[0],
        }
        if r["wrec"]:
            out[name]["mean_label_acc_occupied"] = float(np.mean(r["wrec"]))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
