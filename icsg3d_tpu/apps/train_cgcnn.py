"""CGCNN property-regression training CLI.

Reference: train_cgcnn.py (defaults: batch 32, lr 1e-3, 60 epochs, MSE loss,
best-val-MAE checkpointing).  Graphs are featurized once up front from CIFs
or synthetic structures, then batches stream from packed arrays.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from icsg3d_tpu.apps import common

from icsg3d_tpu.config import CGCNNConfig, TrainConfig
from icsg3d_tpu.data.graphs import GraphSpec, featurize_batch
from icsg3d_tpu.train.cgcnn import create_cgcnn_state, train_cgcnn


def graph_arrays_from_cifs(cif_dir, targets_csv, target_column, spec):
    import csv

    from icsg3d_tpu.crystal.cif import read_cif

    target_map = {}
    with open(targets_csv) as f:
        for row in csv.DictReader(f):
            key = row.get("task_id") or row.get("id") or row.get("material_id")
            if key and row.get(target_column) not in (None, ""):
                target_map[key] = float(row[target_column])

    structures, targets = [], []
    for fname in sorted(os.listdir(cif_dir)):
        if not fname.endswith(".cif"):
            continue
        sid = fname[: -len(".cif")]
        if sid not in target_map:
            continue
        try:
            s = read_cif(os.path.join(cif_dir, fname))
        except Exception:
            continue
        if 0 < len(s) <= spec.max_atoms:
            structures.append(s)
            targets.append(target_map[sid])
    graphs = featurize_batch(structures, spec)
    graphs["target"] = np.asarray(targets, np.float32)
    return graphs


def graph_arrays_synthetic(n, seed, spec, prop="formation_energy"):
    from icsg3d_tpu.data import synthetic

    target_fn = {
        "formation_energy": synthetic.synthetic_target,
        "band_gap": synthetic.synthetic_band_gap,
    }[prop]
    structures = synthetic.random_structures(
        n, seed=seed, kinds=("perovskite", "rocksalt")
    )
    graphs = featurize_batch(structures, spec)
    graphs["target"] = np.asarray(
        [target_fn(s) for s in structures], np.float32
    )
    return graphs


def main(argv=None):
    p = argparse.ArgumentParser(description="Train the CGCNN regressor")
    p.add_argument("--cifs", default=None)
    p.add_argument("--targets-csv", default=None)
    p.add_argument("--target", default="formation_energy_per_atom")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument(
        "--synthetic-property", default="formation_energy",
        choices=("formation_energy", "band_gap"),
        help="which deterministic pseudo property the synthetic graphs "
             "regress — train one checkpoint per property for the "
             "multi-property generate loop (generate.py:280-286)",
    )
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--split-frac", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="save the latest checkpoint every N epochs (best is "
                        "always saved; the full-state fetch is expensive "
                        "over a remote device link)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --ckpt")
    p.add_argument("--ckpt", default="checkpoints/cgcnn")
    args = p.parse_args(argv)

    cfg = CGCNNConfig()
    spec = GraphSpec(
        max_atoms=cfg.max_atoms, max_neighbors=cfg.max_neighbors,
        radius=cfg.radius, dmin=cfg.dmin, step=cfg.step,
    )
    if args.synthetic:
        graphs = graph_arrays_synthetic(
            args.synthetic, args.seed, spec, prop=args.synthetic_property
        )
    elif args.cifs and args.targets_csv:
        graphs = graph_arrays_from_cifs(
            args.cifs, args.targets_csv, args.target, spec
        )
    else:
        p.error("need --synthetic N or --cifs + --targets-csv")

    n = len(graphs["target"])
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(n)
    cut = int(args.split_frac * n)
    train_idx, val_idx = order[:cut], order[cut:]

    def batches(idx, shuffle=False, seed_offset=0):
        # persistent rng: each epoch (each gen() iteration) draws a new
        # permutation instead of replaying the split order forever.
        # seed_offset folds in resume progress — chunked --resume runs in
        # fresh processes would otherwise replay the same permutation
        # sequence every chunk
        brng = np.random.default_rng(args.seed + 1 + seed_offset)

        def gen():
            order = brng.permutation(len(idx)) if shuffle else np.arange(len(idx))
            for s in range(0, len(idx) - args.batch_size + 1, args.batch_size):
                sel = idx[order[s : s + args.batch_size]]
                yield {k: v[sel] for k, v in graphs.items()}

        return gen

    from icsg3d_tpu.parallel import make_mesh

    n_data = make_mesh().shape["data"]
    if args.batch_size % n_data:
        p.error(
            f"--batch-size {args.batch_size} must be divisible by the "
            f"data mesh axis ({n_data} devices)"
        )
    tc = TrainConfig(batch_size=args.batch_size, learning_rate=args.lr)
    _ck = common.checkpoint_if_exists(
        args.ckpt if args.resume else None, "latest"
    )
    resuming = _ck is not None
    model, state = create_cgcnn_state(
        cfg, tc, jax.random.key(args.seed), abstract=resuming
    )
    if resuming:
        state = _ck.restore(state, "latest")
        print(f"resumed from {args.ckpt}/latest at step {int(state.step)}")
        # see apps/train_vae.py: truncate prior history beyond the
        # checkpoint's epoch count (crash-resume double-count, ADVICE r4)
        resumed_epochs = int(state.step) // max(
            1, len(train_idx) // args.batch_size
        )
    else:
        resumed_epochs = None
    state, history = train_cgcnn(
        model, state,
        batches(train_idx, shuffle=True, seed_offset=int(state.step)),
        batches(val_idx),
        epochs=args.epochs, checkpoint_dir=args.ckpt,
        latest_every=args.ckpt_every,
    )
    import json as _json

    # --resume appends to the existing curve (chunked-campaign parity
    # with apps/train_vae.py — see the note there)
    hist_path = os.path.join(args.ckpt, "history.json")
    if args.resume and os.path.exists(hist_path):
        try:
            with open(hist_path) as f:
                prev = _json.load(f)
            if resumed_epochs is not None:
                prev = prev[:resumed_epochs]
            history = prev + history
        except (ValueError, OSError):
            pass
    with open(hist_path, "w") as f:
        _json.dump(history, f, indent=1)
    if history:
        print(f"done; best val MAE "
              f"{min(h['val']['mae'] for h in history):.4f} -> {args.ckpt}")
    else:
        print(f"done; 0 epochs ran -> {args.ckpt}")


if __name__ == "__main__":
    main()
