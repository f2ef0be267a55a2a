"""Latent-space interpolation between two compounds.

Reference: interpolate.py — encode two samples (per condition bin), linearly
interpolate in z, decode ``ninterps`` steps, save slice plots.
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from icsg3d_tpu.apps import common
from icsg3d_tpu.config import GridSpec
from icsg3d_tpu.data.binning import bin_and_encode
from icsg3d_tpu.data.store import GridDataset


def interpolate_latents(
    vae_model,
    vae_vars,
    x_a: np.ndarray,
    cond_a: np.ndarray,
    x_b: np.ndarray,
    cond_b: np.ndarray,
    n_interps: int = 10,
) -> np.ndarray:
    """Decode a linear path between the posterior means of two samples.

    Returns (n_interps + 2, d, d, d, C): the RAW endpoint grids a/b frame
    the decoded steps, matching the reference's [a, interps..., b] strip
    (interpolate.py:49,60-62) and this file's sweep mode.
    """
    encode = common.jit_vae_encode(vae_model, vae_vars)
    decode = common.jit_vae_decode(vae_model, vae_vars)

    z_a, _ = encode(jnp.asarray(x_a[None]), jnp.asarray(cond_a[None]))
    z_b, _ = encode(jnp.asarray(x_b[None]), jnp.asarray(cond_b[None]))
    z_a, z_b = np.asarray(z_a)[0], np.asarray(z_b)[0]

    ts = np.linspace(0.0, 1.0, n_interps)[:, None].astype(np.float32)
    zs = (1.0 - ts) * z_a + ts * z_b
    conds = (1.0 - ts) * cond_a[None] + ts * cond_b[None]
    out = np.asarray(
        decode(jnp.asarray(zs), jnp.asarray(conds.astype(np.float32)))
    )
    return np.concatenate([x_a[None], out, x_b[None]], axis=0)


def interpolate_sweep(
    vae_model,
    vae_vars,
    dataset,
    bin_idx: np.ndarray,
    n_bins: int,
    n_interps: int = 10,
    seed: int = 0,
):
    """Per-condition-bin interpolation sweep (interpolate.py:47-64,107-110).

    For EACH condition bin: pick two random samples from that bin, encode
    both under the bin's FIXED one-hot condition, decode ``n_interps``
    linear latent steps under the same fixed condition, and concatenate the
    raw endpoint grids a/b onto the strip — one (n_interps + 2, d, d, d, C)
    row per bin.  Bins with fewer than two samples are skipped.

    Returns (rows, row_meta): rows is a list of arrays, row_meta a list of
    {"bin", "a", "b"} dicts.
    """
    encode = common.jit_vae_encode(vae_model, vae_vars)
    decode = common.jit_vae_decode(vae_model, vae_vars)
    rng = np.random.default_rng(seed)
    ids = np.asarray(dataset.ids)

    rows, row_meta = [], []
    for b in range(n_bins):
        members = np.flatnonzero(bin_idx == b)
        if len(members) < 2:
            continue
        ia, ib = rng.choice(members, 2, replace=False)
        cond = np.eye(n_bins, dtype=np.float32)[b]
        sel = np.array([ia, ib])
        x = common.grid_input(
            np.asarray(dataset.arrays["density"][sel]),
            np.asarray(dataset.arrays["coords"][sel]),
        )
        z, _ = encode(jnp.asarray(x), jnp.asarray(np.stack([cond, cond])))
        z_a, z_b = np.asarray(z)
        ts = np.linspace(0.0, 1.0, n_interps)[:, None].astype(np.float32)
        zs = (1.0 - ts) * z_a + ts * z_b
        conds = np.repeat(cond[None], n_interps, axis=0)
        mids = np.asarray(decode(jnp.asarray(zs), jnp.asarray(conds)))
        # endpoints a/b are the RAW grids, concatenated onto the strip
        # (reference interpolate.py:49,60-62: output = [a, interps..., b])
        rows.append(np.concatenate([x[:1], mids, x[1:]], axis=0))
        row_meta.append({"bin": b, "a": str(ids[ia]), "b": str(ids[ib])})
    return rows, row_meta


def _save_voxel_row(grids, path):
    """Row of exploded 3D voxel renders (interpolate.py:174-202 3D mode)."""
    import matplotlib.pyplot as plt

    from icsg3d_tpu import viz

    n = len(grids)
    fig = plt.figure(figsize=(2.5 * n, 2.5))
    for i, g in enumerate(grids):
        ax = fig.add_subplot(1, n, i + 1, projection="3d")
        viz.plot_voxels_3d(np.asarray(g), resample_d=12, ax=ax)
    fig.savefig(path, dpi=120)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description="Interpolate between compounds")
    p.add_argument("--data", required=True)
    p.add_argument("--vae-ckpt", required=True)
    p.add_argument("--a", help="first sample id (pair mode)")
    p.add_argument("--b", help="second sample id (pair mode)")
    p.add_argument(
        "--sweep-conds", action="store_true",
        help="reference parity mode: one interpolation strip per condition "
             "bin, random same-bin pair under the bin's fixed one-hot, raw "
             "endpoints included (interpolate.py:47-64,107-110)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ninterps", type=int, default=10)
    p.add_argument("--d", type=int, default=None,
                   help="grid resolution; default: read from the dataset")
    p.add_argument("--cond-bins", type=int, default=10)
    common.add_vae_flags(p)
    p.add_argument("--output", default="output/interpolation")
    p.add_argument(
        "--voxels", action="store_true",
        help="also save a row of exploded 3D voxel renders "
             "(interpolate.py:174-202 3D mode)",
    )
    args = p.parse_args(argv)

    ds = GridDataset(args.data)
    args.d = common.resolve_grid_d(args.d, ds)
    grid = GridSpec(d=args.d)
    bin_idx, conds, _ = bin_and_encode(
        np.asarray(ds.arrays["target"]), args.cond_bins
    )
    vae_model, vae_vars = common.load_vae(
        common.vae_config_from_args(args, grid), args.vae_ckpt
    )

    if args.sweep_conds:
        rows, row_meta = interpolate_sweep(
            vae_model, vae_vars, ds, bin_idx, args.cond_bins,
            n_interps=args.ninterps, seed=args.seed,
        )
        os.makedirs(args.output, exist_ok=True)
        from icsg3d_tpu import viz

        for row, meta in zip(rows, row_meta):
            b = meta["bin"]
            np.save(os.path.join(args.output, f"interpolation_bin{b}.npy"), row)
            viz.plot_interpolation(
                row, os.path.join(args.output, f"interpolation_bin{b}.png")
            )
            if args.voxels:
                _save_voxel_row(
                    row,
                    os.path.join(args.output, f"interpolation_bin{b}_3d.png"),
                )
        import json

        with open(os.path.join(args.output, "sweep.json"), "w") as f:
            json.dump(row_meta, f, indent=1)
        print(
            f"wrote {len(rows)} condition-bin strips "
            f"({args.ninterps}+2 steps each) -> {args.output}"
        )
        return

    if not args.a or not args.b:
        p.error("pair mode needs --a and --b (or use --sweep-conds)")
    ia, ib = ds.index[args.a], ds.index[args.b]
    x_a = common.grid_input(
        np.asarray(ds.arrays["density"][ia])[None],
        np.asarray(ds.arrays["coords"][ia])[None],
    )[0]
    x_b = common.grid_input(
        np.asarray(ds.arrays["density"][ib])[None],
        np.asarray(ds.arrays["coords"][ib])[None],
    )[0]

    grids = interpolate_latents(
        vae_model, vae_vars, x_a, conds[ia], x_b, conds[ib], args.ninterps
    )
    os.makedirs(args.output, exist_ok=True)
    np.save(os.path.join(args.output, "interpolation.npy"), grids)

    from icsg3d_tpu import viz

    viz.plot_interpolation(
        grids, os.path.join(args.output, "interpolation.png")
    )
    if args.voxels:
        _save_voxel_row(
            grids, os.path.join(args.output, "interpolation_3d.png")
        )
    print(f"wrote {args.ninterps}+2 interpolation frames -> {args.output}")


if __name__ == "__main__":
    main()
