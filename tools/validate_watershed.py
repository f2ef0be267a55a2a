"""Population-scale validation of the host watershed's documented
divergences and of the fused device extractor (VERDICT round-1 items 1/10).

Three implementations are compared on REAL decoded grids (not clean
voxelizer output):

1. production host path  — ops/segmentation.py (vectorized flood,
   max-label tie-break, hull-volume convexity for large blobs, rim always
   background);
2. reference-faithful variant (below) — heap-based priority flood with
   FIFO-among-equals ordering, exact Delaunay voxel-in-hull convexity at
   every size, and the reference's exact marker/rim semantics including
   the label-1 rim-zeroing quirk (watershed.py:98-111);
3. fused device extractor — ops/extract.py with peak splitting.

Usage (on the TPU host, after the campaign checkpoints exist):

    python tools/validate_watershed.py --data data/ns10k \
        --vae-ckpt checkpoints/ns10k/vae --unet-ckpt checkpoints/ns10k/unet \
        --base <id> --nsamples 1000 --out output/ns10k/watershed_validation.json

Reports, per population (generation set and validation-reconstruction set):
  % samples where atom counts differ, mean |dN|, mean matched-position
  distance — for production-vs-faithful and device-vs-production.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import heapq
import json
import time
from typing import List, Tuple

import numpy as np
from scipy import ndimage

from icsg3d_tpu.ops import segmentation as seg


# ---------------------------------------------------------------------------
# Reference-faithful watershed variant
# ---------------------------------------------------------------------------

def watershed_flood_pq(elevation: np.ndarray, markers: np.ndarray) -> np.ndarray:
    """Heap-based marker flood with skimage's ordering: priority =
    (elevation, insertion age), markers' neighbors seeded in raster order,
    6-connectivity.  The per-voxel queue is the tie-break-faithful oracle
    the vectorized production flood is validated against."""
    out = markers.astype(np.int64).copy()
    shape = out.shape
    heap: List[Tuple[float, int, int, int, int, int]] = []
    age = 0
    nbrs = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]

    def push_neighbors(i, j, k, label):
        nonlocal age
        for di, dj, dk in nbrs:
            a, b, c = i + di, j + dj, k + dk
            if 0 <= a < shape[0] and 0 <= b < shape[1] and 0 <= c < shape[2]:
                if out[a, b, c] == 0:
                    heapq.heappush(
                        heap, (float(elevation[a, b, c]), age, a, b, c, label)
                    )
                    age += 1

    for (i, j, k) in np.argwhere(markers > 0):
        push_neighbors(int(i), int(j), int(k), int(markers[i, j, k]))
    while heap:
        _, _, i, j, k, label = heapq.heappop(heap)
        if out[i, j, k] != 0:
            continue
        out[i, j, k] = label
        push_neighbors(i, j, k, label)
    return out


_EXACT_CAP = 8000  # ~1 s of find_simplex; larger blobs (untrained-decoder
#                    artifacts) fall back to the production approximation


def convexity_exact(mask: np.ndarray) -> float:
    """Exact voxel-in-hull convexity (skimage.convex_hull_image semantics)
    up to _EXACT_CAP voxels — covers every realistic atom blob; beyond it
    the production estimate is reused (exact counting measured ~46 s on a
    15k-voxel degenerate blob)."""
    pts = np.argwhere(mask != 0)
    n = len(pts)
    if n <= 4:
        return 1.0
    if n > _EXACT_CAP:
        return seg.convexity(mask)
    try:
        from scipy.spatial import Delaunay

        hull = Delaunay(pts)
    except Exception:
        return 1.0
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    grid = np.mgrid[
        lo[0]: hi[0] + 1, lo[1]: hi[1] + 1, lo[2]: hi[2] + 1
    ].reshape(3, -1).T
    return n / max(int((hull.find_simplex(grid) >= 0).sum()), 1)


def segment_nuclei_faithful(
    binary: np.ndarray,
    species: np.ndarray,
    intensity: np.ndarray,
    wmin: int = 8,
    it: int = 1,
    max_iters: int = 5,
    min_convexity: float = 0.8,
) -> np.ndarray:
    """Reference watershed.py:40-155 with its EXACT quirks:

    - blobs carry their label VALUE (not 1), so the unknown-rim zeroing
      ``markers[unknown == 1] = 0`` fires only for label 1
      (watershed.py:100-108);
    - rim voxels of label-1 blobs flood from the nearest marker (queue
      order); rims of other labels keep the background marker and are
      dropped with the background basin;
    - exact convexity at every size;
    - heap flood with FIFO-among-equals ordering.
    """
    R = np.zeros(binary.shape, dtype=np.float64)
    binary = binary.astype(int)

    labels = seg.label_same_value(binary, connectivity=1)
    classes, counts = np.unique(labels, return_counts=True)
    keep = [c for c, n in zip(classes, counts) if n > 3 and c != 0]

    for cl in keep:
        mask = labels == cl
        bbox = seg._bbox_of(mask)
        binary_bbox = seg._crop(np.where(mask, labels, 0), bbox)
        intensity_bbox = seg._crop(np.where(mask, intensity, 0), bbox)
        species_bbox = seg._crop(np.where(mask, species, 0), bbox)

        if convexity_exact(binary_bbox) >= min_convexity:
            max_class = np.max(R)
            region = seg._crop(R, bbox)
            region[:] = np.where(binary_bbox == cl, max_class + 1, region)
            continue

        kernel = seg.ball(1)
        fg = seg.erosion(binary_bbox, kernel)
        bg = seg.dilation(binary_bbox, kernel)
        unknown = bg - fg
        markers = seg.label_same_value(fg.astype(int), connectivity=1) + 1
        markers[unknown == 1] = 0  # fires only when cl == 1 (label-valued)

        wss = watershed_flood_pq(binary_bbox.astype(float), markers)
        wss[wss == 1] = 0
        max_class = np.max(R)
        # the reference does NOT compact labels: basins keep their marker
        # values (+max_class), so recursion labels start at 2 and the rim
        # zeroing can only ever fire at the top level (watershed.py:112-114)
        wss = wss + max_class
        wss[wss == max_class] = 0
        nclasses = len(np.unique(wss)) - 1

        if int(np.count_nonzero(wss) / wmin) > nclasses and it < max_iters:
            Rp = segment_nuclei_faithful(
                wss, species_bbox, intensity_bbox,
                wmin=wmin, it=it + 1, max_iters=max_iters,
                min_convexity=min_convexity,
            )
            max_class = np.max(R)
            Rp = Rp + max_class
            Rp[Rp == max_class] = 0
            region = seg._crop(R, bbox)
            region[:] = np.where(Rp != 0, Rp, region)
        else:
            region = seg._crop(R, bbox)
            region[:] = np.where(wss != 0, wss, region)
    return R


def watershed_clustering_faithful(M, S, Sb, **kw):
    M = np.asarray(M).squeeze()
    S = np.asarray(S).squeeze()
    Sb = np.asarray(Sb).squeeze()
    R = segment_nuclei_faithful(Sb, S, M, **kw)
    atoms, means = seg.centroids(S, R)
    return np.array(atoms), np.array(means)


# ---------------------------------------------------------------------------
# Ground-truth adjudication (VERDICT r2 item 5)
#
# Round 2 showed prod-vs-faithful diverging on 27.8% of val reconstructions
# and argued "neither is ground truth" — but ground truth EXISTS for that
# population: the true CIF sites stored in the dataset, exactly what
# /root/reference/eval.py:182-213 compares against.  This pass measures,
# per variant, the reference's own metrics (EMD via rectangular assignment,
# eval.py:45-53; |dN|) against the true sites — overall and restricted to
# the disagreement subset — so the divergence question closes with data.
# ---------------------------------------------------------------------------

def adjudicate_vs_truth(grids) -> dict:
    """grids: iterable of (M, S, Sb, cart_true, l_pred, dv_pred, eps_frac).

    Runs BOTH watershed variants on each reconstruction, converts their
    voxel centroids to cartesians with the sample's predicted lattice
    (generate.py:237-241 transform), and scores each against the true
    sites.  Returns per-variant means overall and on the subset where the
    variants disagree on atom count.
    """
    from icsg3d_tpu.ops.emd import earth_movers_distance

    acc = {
        "prod": {"emd": [], "dn": []},
        "faithful": {"emd": [], "dn": []},
        "n": 0, "n_disagree": 0, "faithful_failures": 0,
        "disagree_idx": [],
    }
    for (M, S, Sb, cart_true, l_pred, dv_pred, eps_frac) in grids:
        try:
            atoms_f, mu_f = watershed_clustering_faithful(M, S, Sb)
        except RecursionError:
            acc["faithful_failures"] += 1
            continue
        atoms_p, mu_p = seg.watershed_clustering(M, S, Sb)
        i = acc["n"]
        acc["n"] += 1
        disagree = len(atoms_p) != len(atoms_f)
        if disagree:
            acc["n_disagree"] += 1
            acc["disagree_idx"].append(i)
        n_true = len(cart_true)
        for name, mu, atoms in (
            ("prod", mu_p, atoms_p), ("faithful", mu_f, atoms_f)
        ):
            mu = np.asarray(mu, np.float64).reshape(-1, 3)
            cart = (
                mu * dv_pred - eps_frac * l_pred + dv_pred / 2.0
                if len(mu) else np.zeros((0, 3))
            )
            acc[name]["emd"].append(earth_movers_distance(cart, cart_true))
            acc[name]["dn"].append(abs(len(atoms) - n_true))

    out = {
        "n": acc["n"],
        "n_disagree": acc["n_disagree"],
        "pct_disagree": round(100.0 * acc["n_disagree"] / max(acc["n"], 1), 2),
        "faithful_failures": acc["faithful_failures"],
    }
    dis = np.zeros(acc["n"], bool)
    dis[acc["disagree_idx"]] = True
    for name in ("prod", "faithful"):
        emd = np.asarray(acc[name]["emd"], np.float64)
        dn = np.asarray(acc[name]["dn"], np.float64)
        fin = np.isfinite(emd)
        out[name] = {
            "mean_emd_vs_truth": round(float(emd[fin].mean()), 4)
            if fin.any() else None,
            "mean_dn_vs_truth": round(float(dn.mean()), 4) if len(dn) else None,
            "disagree_subset": {
                "mean_emd_vs_truth": round(float(emd[dis & fin].mean()), 4)
                if (dis & fin).any() else None,
                "mean_dn_vs_truth": round(float(dn[dis].mean()), 4)
                if dis.any() else None,
            },
        }
    return out


# ---------------------------------------------------------------------------
# Comparison harness
# ---------------------------------------------------------------------------

def match_distance(mu_a: np.ndarray, mu_b: np.ndarray) -> float:
    """Mean nearest-neighbor distance between two centroid sets (voxels)."""
    if len(mu_a) == 0 or len(mu_b) == 0:
        return float("nan")
    d = np.linalg.norm(mu_a[:, None, :] - mu_b[None, :, :], axis=-1)
    return float(0.5 * (d.min(axis=1).mean() + d.min(axis=0).mean()))


def compare_populations(grids) -> dict:
    """grids: iterable of (M, S, Sb, atoms_dev, mu_dev) numpy tuples —
    density, species labels, binary occupancy from the SAME decoded sample,
    plus the fused device extractor's output for it (atoms_dev=None to skip
    the device comparison)."""
    stats = {
        "n": 0,
        "prod_vs_faithful": {"count_diff": 0, "dn": [], "pos": []},
        "device_vs_prod": {"count_diff": 0, "dn": [], "pos": []},
        "faithful_failures": 0,
    }
    for (M, S, Sb, atoms_dev, mu_dev) in grids:
        atoms_p, mu_p = seg.watershed_clustering(M, S, Sb)
        try:
            atoms_f, mu_f = watershed_clustering_faithful(M, S, Sb)
        except RecursionError:
            stats["faithful_failures"] += 1
            continue
        stats["n"] += 1
        pf = stats["prod_vs_faithful"]
        pf["dn"].append(abs(len(atoms_p) - len(atoms_f)))
        pf["count_diff"] += int(len(atoms_p) != len(atoms_f))
        pf["pos"].append(match_distance(np.asarray(mu_p), np.asarray(mu_f)))
        if atoms_dev is not None:
            dv = stats["device_vs_prod"]
            dv["dn"].append(abs(len(atoms_dev) - len(atoms_p)))
            dv["count_diff"] += int(len(atoms_dev) != len(atoms_p))
            if mu_dev is not None:
                dv["pos"].append(
                    match_distance(np.asarray(mu_dev), np.asarray(mu_p))
                )
    for key in ("prod_vs_faithful", "device_vs_prod"):
        s = stats[key]
        n = max(len(s["dn"]), 1)
        s["pct_count_differ"] = round(100.0 * s["count_diff"] / n, 2)
        s["mean_dn"] = round(float(np.mean(s["dn"])), 4) if s["dn"] else None
        pos = [p for p in s["pos"] if np.isfinite(p)]
        s["mean_matched_pos_voxels"] = (
            round(float(np.mean(pos)), 4) if pos else None
        )
        del s["dn"], s["pos"]
    return stats


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from icsg3d_tpu.apps import common
    from icsg3d_tpu.apps.generate import decode_and_segment_fn, fused_generate_fn
    from icsg3d_tpu.config import GridSpec, PipelineConfig, UNetConfig
    from icsg3d_tpu.data.binning import bin_and_encode
    from icsg3d_tpu.data.splits import data_split
    from icsg3d_tpu.data.store import GridDataset

    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--vae-ckpt", required=True)
    p.add_argument("--unet-ckpt", required=True)
    p.add_argument("--base", required=True)
    p.add_argument("--nsamples", type=int, default=1000)
    p.add_argument("--nval", type=int, default=0,
                   help="also compare over N validation reconstructions")
    p.add_argument("--adjudicate", action="store_true",
                   help="score both watershed variants against the TRUE "
                        "CIF sites over the --nval reconstructions "
                        "(reference eval.py:182-213 metrics)")
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--var", type=float, default=0.5)
    p.add_argument("--d", type=int, default=32)
    p.add_argument("--cond-bins", type=int, default=10)
    p.add_argument("--num-classes", type=int, default=95)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="output/watershed_validation.json")
    common.add_vae_flags(p)
    args = p.parse_args(argv)

    grid = GridSpec(d=args.d)
    pipe = PipelineConfig(grid=grid)
    ds = GridDataset(args.data)
    _, conds, _ = bin_and_encode(
        np.asarray(ds.arrays["target"]), args.cond_bins
    )
    vae_model, vae_vars = common.load_vae(
        common.vae_config_from_args(args, grid), args.vae_ckpt
    )
    unet_model, unet_vars = common.load_unet(
        UNetConfig(num_classes=args.num_classes), args.unet_ckpt, grid_d=args.d
    )
    step = decode_and_segment_fn(vae_model, vae_vars, unet_model, unet_vars, pipe)
    fused = fused_generate_fn(vae_model, vae_vars, unet_model, unet_vars, pipe)
    encode = common.jit_vae_encode(vae_model, vae_vars)

    ib = ds.index[args.base]
    x_base = common.grid_input(
        np.asarray(ds.arrays["density"][ib])[None],
        np.asarray(ds.arrays["coords"][ib])[None],
    )
    cond = conds[ib][None].astype(np.float32)
    z_mu, _ = encode(jnp.asarray(x_base), jnp.asarray(cond))
    z_mu = np.asarray(z_mu)[0]

    rng = np.random.default_rng(args.seed)
    results = {}

    def gen_grids():
        n_done = 0
        fused_s = 0.0
        while n_done < args.nsamples:
            n = min(args.batch_size, args.nsamples - n_done)
            z = rng.normal(z_mu, np.sqrt(args.var), size=(n, len(z_mu)))
            z = z.astype(np.float32)
            cb = np.repeat(cond, n, axis=0)
            from icsg3d_tpu.ops.extract import extract_atoms_batch

            M, lattice, dv, labels, binary = step(
                jnp.asarray(z), jnp.asarray(cb)
            )
            # time the FULL fused program (decode->segment->extract->coords)
            t0 = time.time()
            _, atoms_f, _, _ = fused(jnp.asarray(z), jnp.asarray(cb))
            jax.block_until_ready(atoms_f)
            fused_s += time.time() - t0
            # voxel-space device centroids for position comparison: run the
            # extractor on the same decoded grids (what fused runs inline)
            Sm = jnp.where(binary > 0, labels, 0)
            atoms_d, mu_d, valid_d = extract_atoms_batch(
                M[..., 0], Sm, binary,
                method="binary", erosion_levels=1,
                vote_classes=args.num_classes,
            )
            M = np.asarray(M)
            labels = np.asarray(labels)
            binary = np.asarray(binary)
            atoms_d = np.asarray(atoms_d)
            mu_d = np.asarray(mu_d)
            valid_d = np.asarray(valid_d)
            for i in range(n):
                Sb_i = binary[i]
                S_i = np.where(Sb_i > 0, labels[i], 0)
                sel = valid_d[i]
                yield (M[i, ..., 0], S_i, Sb_i, atoms_d[i][sel], mu_d[i][sel])
            n_done += n
        if fused_s > 0:  # --nsamples 0 (adjudicate-only runs) times nothing
            results["fused_samples_per_sec"] = round(args.nsamples / fused_s, 1)

    def val_batches():
        _, val_ids = data_split(ds.ids, n=None, n_rot=0)
        val_ids = val_ids[: args.nval]
        recon = common.jit_vae_reconstruct(vae_model, vae_vars)
        segment = common.jit_unet_segment(
            unet_model, unet_vars, pipe.binary_threshold
        )
        from icsg3d_tpu.ops.grid import to_lattice_params, to_voxel_params

        @jax.jit
        def lattice_of(out):
            l = to_lattice_params(out[..., 1:], grid)
            return l, to_voxel_params(l, grid)

        for s in range(0, len(val_ids), args.batch_size):
            ids_b = val_ids[s: s + args.batch_size]
            rows = ds.rows(ids_b)
            x = common.grid_input(
                np.asarray(ds.arrays["density"][rows]),
                np.asarray(ds.arrays["coords"][rows]),
            )
            cb = conds[rows].astype(np.float32)
            out, _, _ = recon(
                jnp.asarray(x), jnp.asarray(cb), jax.random.key(0)
            )
            labels, binary, _ = segment(out)
            l_pred, dv_pred = lattice_of(out)
            M = np.asarray(out)[..., 0]
            yield (
                rows, M, np.asarray(labels), np.asarray(binary),
                np.asarray(l_pred, np.float64), np.asarray(dv_pred, np.float64),
            )

    def val_grids():
        for rows, M, labels, binary, _, _ in val_batches():
            for i in range(len(rows)):
                Sb_i = binary[i]
                S_i = np.where(Sb_i > 0, labels[i], 0)
                yield (M[i], S_i, Sb_i, None, None)

    def val_truth_grids():
        has_sites = "sites" in ds.arrays and "site_z" in ds.arrays
        if not has_sites:
            raise SystemExit(
                "--adjudicate needs the dataset's stored true sites "
                "(sites/site_z arrays)"
            )
        for rows, M, labels, binary, l_pred, dv_pred in val_batches():
            sites = np.asarray(ds.arrays["sites"][rows], np.float64)
            site_z = np.asarray(ds.arrays["site_z"][rows])
            for i in range(len(rows)):
                Sb_i = binary[i]
                S_i = np.where(Sb_i > 0, labels[i], 0)
                cart_true = sites[i][site_z[i] > 0]
                yield (
                    M[i], S_i, Sb_i, cart_true, l_pred[i], dv_pred[i],
                    grid.eps_frac,
                )

    print(f"comparing over {args.nsamples} generated samples ...")
    results["generation"] = compare_populations(gen_grids())
    if args.nval:
        print(f"comparing over {args.nval} validation reconstructions ...")
        results["validation"] = compare_populations(val_grids())
    if args.adjudicate and args.nval:
        print(f"adjudicating vs true sites over {args.nval} "
              "reconstructions ...")
        results["adjudication"] = adjudicate_vs_truth(val_truth_grids())

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
