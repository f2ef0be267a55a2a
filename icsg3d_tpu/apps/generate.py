"""End-to-end generation: sample latents around a base compound, decode,
segment, extract atoms, emit structures/CIFs, predict properties.

Reference: generate.py.  Differences by design:

- decode + segmentation + lattice-parameter recovery run as one jitted
  device program per batch (the reference round-tripped through three
  separate Keras predict calls);
- CGCNN weights load ONCE per property for the whole run and predictions
  run batched over all generated structures (the reference re-loaded and
  re-compiled weights per property *per sample*, cgcnn/utils.py:81-93);
- graph featurization happens directly on the generated Structure objects —
  no CIF round trip through the filesystem;
- grid geometry comes from GridSpec (the reference hardcoded 32s,
  generate.py:211-221).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from icsg3d_tpu.apps import common
from icsg3d_tpu.config import (
    CGCNNConfig,
    GridSpec,
    PipelineConfig,
    UNetConfig,
    VAEConfig,
)
from icsg3d_tpu.crystal.cif import write_cif
from icsg3d_tpu.crystal.structure import Structure
from icsg3d_tpu.data.graphs import GraphSpec, featurize_batch
from icsg3d_tpu.ops.grid import to_lattice_params, to_voxel_params, voxel_to_cartesian
from icsg3d_tpu.ops.segmentation import watershed_clustering


def decode_and_segment_fn(vae_model, vae_vars, unet_model, unet_vars, pipe: PipelineConfig):
    """One fused XLA program: decode latents -> segment -> lattice params."""
    grid = pipe.grid

    @jax.jit
    def fn(z, cond):
        M = vae_model.apply(
            vae_vars, z, cond, method=type(vae_model).decode
        )
        lattice = to_lattice_params(M[..., 1:], grid)
        dv = to_voxel_params(lattice, grid)
        soft, sig = unet_model.apply(unet_vars, M, train=False)
        # argmax over logits == argmax over softmax; skip the 95-way
        # softmax over the full voxel grid
        labels = jnp.argmax(soft, axis=-1)
        binary = (
            jax.nn.sigmoid(sig[..., 0]) > pipe.binary_threshold
        ).astype(jnp.int32)
        return M, lattice, dv, labels, binary

    return fn


def fused_generate_fn(
    vae_model, vae_vars, unet_model, unet_vars, pipe: PipelineConfig,
    max_atoms: int = 64,
):
    """The ENTIRE generation step as one XLA program (BASELINE north star):
    decode latents -> U-Net segment -> device atom extraction ->
    voxel->Cartesian coordinates.  Host code only wraps results into
    Structure objects."""
    from icsg3d_tpu.ops.extract import extract_atoms_batch

    grid = pipe.grid

    @jax.jit
    def fn(z, cond):
        M = vae_model.apply(vae_vars, z, cond, method=type(vae_model).decode)
        lattice = to_lattice_params(M[..., 1:], grid)
        dv = to_voxel_params(lattice, grid)
        soft, sig = unet_model.apply(unet_vars, M, train=False)
        labels = jnp.argmax(soft, axis=-1)
        binary = (
            jax.nn.sigmoid(sig[..., 0]) > pipe.binary_threshold
        ).astype(jnp.int32)
        # method="binary" mirrors the host pipeline (binary-blob CC,
        # erosion-marker splitting, per-region majority vote): measured
        # 1000/1000 atom-count parity with the host watershed on the
        # campaign generation population.  One erosion level preserved
        # 100% parity there and costs two device loops less than the
        # deeper recursion analog (raise erosion_levels for datasets with
        # thick-waisted touching atoms).
        atoms, mu, valid = extract_atoms_batch(
            M[..., 0], jnp.where(binary > 0, labels, 0), binary,
            max_atoms=max_atoms,
            method="binary", erosion_levels=1,
            vote_classes=unet_model.cfg.num_classes,
        )
        cart = voxel_to_cartesian(
            mu, lattice[:, None, :], dv[:, None, :], grid
        )
        return lattice, atoms, cart, valid

    return fn


def merge_close_atoms(atoms: np.ndarray, cart: np.ndarray, cutoff: float):
    """Merge atoms closer than ``cutoff`` Angstrom into their centroid.

    The 64^3 invalid-structure analysis (COVERAGE round 5) showed the
    failure mode is OVER-SEGMENTATION: the watershed splits one lumpy
    decoded blob into several same-species atoms 0.3-0.5 A apart — no
    real crystal has pairs below ~0.7 A, so sub-cutoff clusters are
    split artifacts, not atoms.  Single-linkage clustering; the merged
    atom takes the cluster's most-common species and mean position.
    cutoff <= 0 is the identity (default: reference-faithful off).
    """
    n = len(atoms)
    if cutoff <= 0 or n <= 1:
        return np.asarray(atoms), np.asarray(cart)
    cart = np.asarray(cart, np.float64)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    d2 = ((cart[:, None, :] - cart[None, :, :]) ** 2).sum(-1)
    for i in range(n):
        for j in range(i + 1, n):
            if d2[i, j] < cutoff * cutoff:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[rj] = ri
    clusters: Dict[int, List[int]] = {}
    for i in range(n):
        clusters.setdefault(find(i), []).append(i)
    za, ca = [], []
    for members in clusters.values():
        zs = [int(atoms[m]) for m in members]
        za.append(max(set(zs), key=zs.count))
        ca.append(cart[members].mean(axis=0))
    return np.asarray(za), np.asarray(ca)


def _structure_fields(lattice, atoms_raw, cart_raw, cutoff, pipe):
    """Post-watershed fields for ONE merge cutoff: {structure, atoms,
    coords, formula, valid}.  Factored out so a sweep over cutoffs
    reuses the expensive decode+segment+watershed work — the cutoff only
    touches this cheap host arithmetic."""
    za, ca = merge_close_atoms(
        np.asarray(atoms_raw).astype(int), cart_raw, cutoff
    )
    structure = Structure.from_cartesian(
        lattice, za, ca, angles=pipe.cell_angles,
    )
    return {
        "structure": structure,
        "atoms": np.asarray(za, int).tolist(),
        "coords": np.asarray(ca).tolist(),
        "formula": structure.reduced_formula,
        "valid": bool(structure.is_valid()),
    }


def _apply_cutoffs(rec, lattice, atoms_raw, cart_raw, pipe,
                   merge_closer_than, merge_sweep):
    """Mutate ``rec`` with the primary cutoff's fields, plus a
    ``by_cutoff`` dict when ``merge_sweep`` lists extra cutoffs (one
    decode/watershed, many merge variants)."""
    rec.update(
        _structure_fields(lattice, atoms_raw, cart_raw, merge_closer_than,
                          pipe)
    )
    if merge_sweep:
        rec["by_cutoff"] = {}
        for c in merge_sweep:
            if c == merge_closer_than:
                entry = {k: rec[k] for k in
                         ("structure", "atoms", "coords", "formula", "valid")}
            else:
                entry = _structure_fields(lattice, atoms_raw, cart_raw, c,
                                          pipe)
            rec["by_cutoff"][f"{c:g}"] = entry


def generate_structures_fused(
    vae_model,
    vae_vars,
    unet_model,
    unet_vars,
    base_density: np.ndarray,
    base_coords: np.ndarray,
    base_cond: np.ndarray,
    n_samples: int = 100,
    batch_size: int = 20,
    var: float = 0.5,
    pipe: PipelineConfig = PipelineConfig(),
    seed: int = 0,
    max_atoms: int = 64,
    merge_closer_than: float = 0.0,
    merge_sweep: Optional[Sequence[float]] = None,
) -> List[Dict]:
    """Fast-path generation: one fused device program per batch, no
    per-sample host loop.  Atom splitting uses the device connected-component
    extractor (ops/extract.py) instead of the recursive host watershed —
    same results on well-separated species regions, canonical host path
    available via generate_structures."""
    encode = common.jit_vae_encode(vae_model, vae_vars)
    step = fused_generate_fn(
        vae_model, vae_vars, unet_model, unet_vars, pipe, max_atoms
    )

    x_base = common.grid_input(base_density[None], base_coords[None])
    cond = np.asarray(base_cond, np.float32)[None]
    z_mu, _ = encode(jnp.asarray(x_base), jnp.asarray(cond))
    z_mu = np.asarray(z_mu)[0]

    rng = np.random.default_rng(seed)
    records: List[Dict] = []
    n_batches = max(1, int(np.ceil(n_samples / batch_size)))
    for b in range(n_batches):
        n = min(batch_size, n_samples - b * batch_size)
        if n <= 0:
            break
        # always run the device program at the full batch shape: a tail
        # batch with its own shape would retrace and recompile the entire
        # fused program (a multi-minute cost through the remote helper)
        z = rng.normal(
            z_mu, np.sqrt(var), size=(batch_size, len(z_mu))
        ).astype(np.float32)
        cond_b = np.repeat(cond, batch_size, axis=0)
        lattice, atoms, cart, valid = step(jnp.asarray(z), jnp.asarray(cond_b))
        lattice = np.asarray(lattice)[:n]
        atoms = np.asarray(atoms)[:n]
        cart = np.asarray(cart)[:n]
        valid = np.asarray(valid)[:n]

        for i in range(n):
            rec: Dict = {"lattice": lattice[i].tolist(), "valid": False}
            sel = valid[i]
            try:
                if sel.any():
                    _apply_cutoffs(rec, lattice[i], atoms[i][sel],
                                   cart[i][sel], pipe, merge_closer_than,
                                   merge_sweep)
            except Exception as e:  # noqa: BLE001 — degenerate decode
                # (e.g. ~zero lattice span -> singular cell matrix) must
                # cost one sample, not the whole run; host-path parity
                # (reference generate.py:246-248 catches per sample too)
                rec["error"] = repr(e)[:200]
            records.append(rec)
    return records


def generate_structures(
    vae_model,
    vae_vars,
    unet_model,
    unet_vars,
    base_density: np.ndarray,
    base_coords: np.ndarray,
    base_cond: np.ndarray,
    n_samples: int = 100,
    batch_size: int = 20,
    var: float = 0.5,
    pipe: PipelineConfig = PipelineConfig(),
    seed: int = 0,
    keep_grids: bool = False,
    merge_closer_than: float = 0.0,
    merge_sweep: Optional[Sequence[float]] = None,
) -> List[Dict]:
    """Sample around the base compound's posterior mean and decode to atoms.

    Returns one record per sample: {structure, lattice, atoms, coords,
    valid, formula}.  Mirrors generate.py:181-267.  keep_grids=True carries
    the decoded density (float16) and segmented species (uint8) grids on
    each record (the reference np.save'd both per sample, generate.py:299).
    """
    grid = pipe.grid
    encode = common.jit_vae_encode(vae_model, vae_vars)
    step = decode_and_segment_fn(vae_model, vae_vars, unet_model, unet_vars, pipe)

    x_base = common.grid_input(base_density[None], base_coords[None])
    cond = np.asarray(base_cond, np.float32)[None]
    z_mu, _ = encode(jnp.asarray(x_base), jnp.asarray(cond))
    z_mu = np.asarray(z_mu)[0]

    rng = np.random.default_rng(seed)
    records: List[Dict] = []
    n_batches = max(1, int(np.ceil(n_samples / batch_size)))
    for b in range(n_batches):
        n = min(batch_size, n_samples - b * batch_size)
        if n <= 0:
            break
        # z ~ N(z_mu_base, var) (generate.py:204).  Sample the full batch
        # shape even for the tail: a shrunken tail batch would recompile
        # the whole decode+segment program through the remote helper.
        z = rng.normal(
            z_mu, np.sqrt(var), size=(batch_size, len(z_mu))
        ).astype(np.float32)
        cond_b = np.repeat(cond, batch_size, axis=0)
        M, lattice, dv, labels, binary = step(jnp.asarray(z), jnp.asarray(cond_b))
        M = np.asarray(M)[:n]
        lattice = np.asarray(lattice)[:n]
        dv = np.asarray(dv)[:n]
        labels = np.asarray(labels)[:n]
        binary = np.asarray(binary)[:n]

        for i in range(n):
            rec: Dict = {"lattice": lattice[i].tolist(), "valid": False}
            if keep_grids:
                rec["density_grid"] = M[i, ..., 0].astype(np.float16)
                sg = np.where(binary[i] > 0, labels[i], 0)
                # uint8 covers every real atomic number; fall back rather
                # than silently wrap exotic --num-classes > 255 configs
                rec["species_grid"] = sg.astype(
                    np.uint8 if sg.max(initial=0) < 256 else np.uint16
                )
            try:
                atoms, mu = watershed_clustering(
                    M[i, ..., 0],
                    np.where(binary[i] > 0, labels[i], 0),
                    binary[i],
                    max_iters=pipe.watershed_max_iters,
                    wmin=pipe.watershed_wmin,
                    min_convexity=pipe.watershed_min_convexity,
                )
                if len(atoms) == 0:
                    records.append(rec)
                    continue
                # pure host arithmetic (mu*dv - eps*l + dv/2): creating
                # per-sample device arrays here both round-trips the
                # tunnel and leaks host RAM (axon plugin, CLAUDE.md)
                cart = (
                    np.asarray(mu) * dv[i]
                    - grid.eps_frac * lattice[i]
                    + dv[i] / 2.0
                )
                _apply_cutoffs(rec, lattice[i], atoms, cart, pipe,
                               merge_closer_than, merge_sweep)
            except Exception as e:  # watershed robustness (generate.py:246-248)
                rec["error"] = str(e)
            records.append(rec)
    return records


def annotate_records(
    records: Sequence[Dict], base_target: float, target: str
) -> None:
    """Per-sample composition stats, mutated in place (generate.py:288-296):
    average Pauling electronegativity, charge balance over common oxidation
    states, and percent deviation of the predicted target property from the
    base compound's value."""
    from icsg3d_tpu.crystal.elements import (
        average_electronegativity,
        is_charge_balanced,
    )

    for r in records:
        if r.get("atoms"):
            r["electronegativity"] = average_electronegativity(r["atoms"])
            r["charge_balanced"] = int(is_charge_balanced(r["atoms"]))
        for entry in (r.get("by_cutoff") or {}).values():
            if entry.get("atoms"):
                entry["charge_balanced"] = int(
                    is_charge_balanced(entry["atoms"])
                )
        pred_target = (r.get("properties") or {}).get(target)
        if pred_target is not None and base_target != 0:
            r["target_diff_pct"] = abs(
                (pred_target - base_target) / base_target
            )


def _write_results_csv(rows: Sequence[Dict], path: str) -> None:
    """Flat CSV of the per-sample records (reference results.csv,
    generate.py:313-318).  Nested ``properties`` become top-level columns;
    list fields are JSON-encoded."""
    import csv

    flat = []
    for r in rows:
        fr = {k: v for k, v in r.items() if k != "properties"}
        fr.update(r.get("properties") or {})
        for k, v in fr.items():
            if isinstance(v, (list, tuple, dict)):
                fr[k] = json.dumps(v)
        flat.append(fr)
    cols: List[str] = []
    for fr in flat:
        for k in fr:
            if k not in cols:
                cols.append(k)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        w.writerows(flat)


def predict_properties(
    records: Sequence[Dict],
    cgcnn_cfg: CGCNNConfig,
    property_checkpoints: Dict[str, str],
    batch_size: int = 32,
) -> None:
    """Batched CGCNN property prediction over the valid generated structures.

    Loads each property's weights once (fixing the reference's
    per-sample-per-property reload, cgcnn/utils.py:81-93) and mutates the
    records in place with a ``properties`` dict.
    """
    spec = GraphSpec(
        max_atoms=cgcnn_cfg.max_atoms,
        max_neighbors=cgcnn_cfg.max_neighbors,
        radius=cgcnn_cfg.radius,
        dmin=cgcnn_cfg.dmin,
        step=cgcnn_cfg.step,
    )
    with_structure = [r for r in records if r.get("structure") is not None]
    usable = [
        r for r in with_structure if 0 < len(r["structure"]) <= spec.max_atoms
    ]
    skipped = len(with_structure) - len(usable)
    if skipped:
        # no silent caps: the fused extractor can emit up to its
        # max_atoms (64 default) while the CGCNN graph pads to
        # spec.max_atoms (50, cgcnn/data.py:161 parity)
        print(
            f"predict_properties: skipping {skipped} structure(s) outside "
            f"1..{spec.max_atoms} atoms (CGCNN pad size)", flush=True,
        )
    if not usable:
        return
    graphs = featurize_batch([r["structure"] for r in usable], spec)

    for prop, ckpt_dir in property_checkpoints.items():
        model, variables = common.load_cgcnn(cgcnn_cfg, ckpt_dir)
        predict = common.jit_cgcnn_predict(model, variables)
        preds = []
        for s in range(0, len(usable), batch_size):
            sl = slice(s, s + batch_size)
            preds.append(
                np.asarray(
                    predict(
                        jnp.asarray(graphs["atom_fea"][sl]),
                        jnp.asarray(graphs["nbr_dist"][sl]),
                        jnp.asarray(graphs["nbr_idx"][sl]),
                        jnp.asarray(graphs["atom_mask"][sl]),
                    )
                )
            )
        preds = np.concatenate(preds)
        for r, p in zip(usable, preds):
            r.setdefault("properties", {})[prop] = float(p)


def main(argv=None):
    p = argparse.ArgumentParser(description="Generate crystal structures")
    p.add_argument("--data", required=True, help="packed GridDataset dir")
    p.add_argument("--base", required=True, help="base sample id")
    p.add_argument("--vae-ckpt", required=True)
    p.add_argument("--unet-ckpt", required=True)
    p.add_argument("--cgcnn-ckpt", default=None, help="dir per property: name=dir,...")
    p.add_argument("--nsamples", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--var", type=float, default=0.5)
    p.add_argument("--d", type=int, default=None,
                   help="grid resolution; default: read from the dataset")
    p.add_argument("--num-classes", type=int, default=95)
    p.add_argument("--target", default="formation_energy_per_atom")
    p.add_argument("--cond-bins", type=int, default=10)
    common.add_vae_flags(p)
    p.add_argument("--binary-threshold", type=float, default=0.8,
                   help="U-Net occupancy (sigmoid) threshold for the "
                        "extraction mask (generate.py:224 default 0.8; "
                        "0.9 recommended at 64³ — tools/diag64_binary.py)")
    p.add_argument("--merge-closer-than", default="0",
                   help="merge extracted atoms closer than this many "
                        "Angstrom into their centroid (0 = off, the "
                        "reference-faithful default).  Sub-0.7 A pairs "
                        "are watershed split artifacts of lumpy 64³ "
                        "decodes, not physical atoms.  A comma list "
                        "(e.g. 0,0.7) sweeps every cutoff in ONE run — "
                        "the decode/segment/watershed work is shared and "
                        "only the cheap merge+validity step repeats")
    p.add_argument("--output", default="output/generated")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--fused", action="store_true",
        help="use the fully-fused device pipeline (one XLA program per "
        "batch) instead of the per-sample host watershed",
    )
    p.add_argument(
        "--save-grids", action="store_true",
        help="save each sample's decoded density and segmented species "
        "grids as .npy (generate.py:299; host path only)",
    )
    args = p.parse_args(argv)
    if args.save_grids and args.fused:
        p.error("--save-grids requires the host path (drop --fused): the "
                "fused program keeps grids on device")
    try:
        merge_cutoffs = [
            float(x) for x in str(args.merge_closer_than).split(",") if x != ""
        ]
    except ValueError:
        p.error(f"--merge-closer-than must be a float or comma list of "
                f"floats, got {args.merge_closer_than!r}")
    if not merge_cutoffs:
        merge_cutoffs = [0.0]

    from icsg3d_tpu.data.binning import bin_and_encode
    from icsg3d_tpu.data.store import GridDataset

    ds = GridDataset(args.data)
    args.d = common.resolve_grid_d(args.d, ds)
    grid = GridSpec(d=args.d)
    pipe = PipelineConfig(grid=grid, cond_bins=args.cond_bins,
                          binary_threshold=args.binary_threshold)
    _, conds, _ = bin_and_encode(
        np.asarray(ds.arrays["target"]), args.cond_bins
    )

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

    if args.base not in ds.index:
        p.error(f"--base {args.base!r} is not an id in {args.data} "
                f"(e.g. {ds.ids[0]!r})")
    row = ds.index[args.base]
    gen_fn = generate_structures_fused if args.fused else generate_structures
    records = gen_fn(
        vae_model, vae_vars, unet_model, unet_vars,
        np.asarray(ds.arrays["density"][row]),
        np.asarray(ds.arrays["coords"][row]),
        conds[row],
        n_samples=args.nsamples,
        batch_size=args.batch_size,
        var=args.var,
        pipe=pipe,
        seed=args.seed,
        merge_closer_than=merge_cutoffs[0],
        merge_sweep=merge_cutoffs if len(merge_cutoffs) > 1 else None,
        **({"keep_grids": True} if args.save_grids else {}),
    )

    if args.cgcnn_ckpt:
        try:
            prop_ckpts = dict(
                kv.split("=", 1)
                for kv in args.cgcnn_ckpt.split(",") if kv.strip()
            )
        except ValueError:
            p.error("--cgcnn-ckpt must be name=dir[,name=dir...], got "
                    f"{args.cgcnn_ckpt!r}")
        predict_properties(records, CGCNNConfig(), prop_ckpts)

    annotate_records(records, float(ds.arrays["target"][row]), args.target)

    os.makedirs(os.path.join(args.output, "cifs"), exist_ok=True)
    if args.save_grids:
        os.makedirs(os.path.join(args.output, "grids"), exist_ok=True)
    n_valid = n_balanced = 0
    sweep_counts = {f"{c:g}": {"valid": 0, "balanced": 0}
                    for c in merge_cutoffs[1:]}
    for key in sweep_counts:
        os.makedirs(os.path.join(args.output, "cifs", f"m{key}"),
                    exist_ok=True)
    rows = []
    for i, r in enumerate(records):
        if r.get("valid"):
            n_valid += 1
            path = os.path.join(args.output, "cifs", f"gen-{i}.cif")
            write_cif(r["structure"], path)
            r["cif"] = path
        for key, entry in (r.get("by_cutoff") or {}).items():
            if key not in sweep_counts:
                continue  # primary cutoff already counted above
            if entry.get("valid"):
                sweep_counts[key]["valid"] += 1
                path = os.path.join(
                    args.output, "cifs", f"m{key}", f"gen-{i}.cif"
                )
                write_cif(entry["structure"], path)
                entry["cif"] = path
            sweep_counts[key]["balanced"] += entry.get("charge_balanced", 0)
        if args.save_grids and "density_grid" in r:
            np.save(
                os.path.join(args.output, "grids", f"gen-{i}_density.npy"),
                r["density_grid"],
            )
            np.save(
                os.path.join(args.output, "grids", f"gen-{i}_species.npy"),
                r["species_grid"],
            )
        n_balanced += r.get("charge_balanced", 0)
        row = {
            k: v for k, v in r.items()
            if k not in ("structure", "density_grid", "species_grid")
        }
        if "by_cutoff" in row:
            row["by_cutoff"] = {
                key: {k: v for k, v in entry.items() if k != "structure"}
                for key, entry in row["by_cutoff"].items()
            }
        rows.append(row)
    with open(os.path.join(args.output, "results.json"), "w") as f:
        json.dump(rows, f, indent=1)
    _write_results_csv(rows, os.path.join(args.output, "results.csv"))
    print(
        f"generated {len(records)} samples, {n_valid} valid structures "
        f"({n_balanced} charge-balanced) -> {args.output}"
    )
    for key, c in sweep_counts.items():
        print(
            f"  merge-closer-than {key}: {c['valid']} valid structures "
            f"({c['balanced']} charge-balanced)"
        )


if __name__ == "__main__":
    main()
