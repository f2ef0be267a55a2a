"""Standalone CGCNN property prediction for CIF files.

Reference: cgcnn/utils.py evaluate_cgcnn_from_cif — featurize a CIF and
predict one or more properties.  Fixes the reference's pathology of
reloading + recompiling weights per property per sample
(cgcnn/utils.py:81-93): weights load once per property, prediction is
batched over all inputs.

Reproducibility note (reference parity, cgcnn/cgcnn.py:76-98): the
CGCNN's masked batch-norm recomputes its statistics from the LIVE batch
at inference — there are no moving averages — so a structure's predicted
value depends slightly on which other structures share its batch.  Keep
the batch composition fixed when comparing runs.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from icsg3d_tpu.apps import common
from icsg3d_tpu.config import CGCNNConfig
from icsg3d_tpu.crystal.cif import read_cif
from icsg3d_tpu.data.graphs import GraphSpec, featurize_batch


def predict_from_cifs(
    cif_paths: List[str],
    property_checkpoints: Dict[str, str],
    cfg: CGCNNConfig = CGCNNConfig(),
    batch_size: int = 32,
) -> List[Dict]:
    """Per-CIF dict of predicted properties (None for unparseable files)."""
    spec = GraphSpec(
        max_atoms=cfg.max_atoms, max_neighbors=cfg.max_neighbors,
        radius=cfg.radius, dmin=cfg.dmin, step=cfg.step,
    )
    records: List[Dict] = []
    structures, rows = [], []
    for path in cif_paths:
        rec = {"cif": path}
        try:
            s = read_cif(path)
            if not (0 < len(s) <= spec.max_atoms):
                raise ValueError(f"{len(s)} sites (max {spec.max_atoms})")
            rec["formula"] = s.reduced_formula
            rows.append(len(records))
            structures.append(s)
        except Exception as e:
            rec["error"] = str(e)
        records.append(rec)

    if structures:
        graphs = featurize_batch(structures, spec)
        for prop, ckpt_dir in property_checkpoints.items():
            model, variables = common.load_cgcnn(cfg, ckpt_dir)
            predict = common.jit_cgcnn_predict(model, variables)
            preds = []
            for s0 in range(0, len(structures), batch_size):
                sl = slice(s0, s0 + batch_size)
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
            for row, p in zip(rows, preds):
                records[row].setdefault("properties", {})[prop] = float(p)
    return records


def main(argv=None):
    p = argparse.ArgumentParser(description="CGCNN property prediction")
    p.add_argument("cifs", nargs="+", help=".cif files or directories")
    p.add_argument(
        "--ckpt", required=True,
        help="property checkpoints: name=dir[,name=dir...]",
    )
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    paths: List[str] = []
    for c in args.cifs:
        if os.path.isdir(c):
            paths.extend(
                os.path.join(c, f) for f in sorted(os.listdir(c))
                if f.endswith(".cif")
            )
        else:
            paths.append(c)

    prop_ckpts = dict(kv.split("=") for kv in args.ckpt.split(","))
    records = predict_from_cifs(paths, prop_ckpts, batch_size=args.batch_size)
    out = json.dumps(records, indent=1)
    print(out)
    if args.output:
        with open(args.output, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
