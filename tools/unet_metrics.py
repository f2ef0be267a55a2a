"""U-Net campaign metrics analysis (VERDICT round-1 item 2).

Makes the headline "weighted f1 0.215" interpretable by separating the
reference's metric definition from model quality:

- the reference's f1_m (unet/unet.py:189-193) counts voxels whose TRUE
  class softmax probability rounds to 1, over ALL voxels.  The training
  class weights zero the background class (95-97% of voxels), so nothing
  pushes background probability mass onto class 0 — background stays
  diffuse, is excluded from tp by round(), and caps f1 near the
  foreground fraction REGARDLESS of segmentation quality;
- argmax-based accuracies (what extraction actually consumes) and
  per-class precision/recall/f1 measure the real quality.

Usage:
    python tools/unet_metrics.py --data data/ns10k \
        --unet-ckpt checkpoints/ns10k/unet --out output/ns10k/unet_metrics.json
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from icsg3d_tpu.apps import common
    from icsg3d_tpu.config import UNetConfig
    from icsg3d_tpu.data.splits import data_split
    from icsg3d_tpu.data.store import BatchIterator, GridDataset
    from icsg3d_tpu.ops import metrics as M
    from icsg3d_tpu.train.unet import prepare_unet_batch

    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--unet-ckpt", required=True)
    p.add_argument("--d", type=int, default=32)
    p.add_argument("--num-classes", type=int, default=95)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--nrot", type=int, default=0)
    p.add_argument("--out", default="output/unet_metrics.json")
    args = p.parse_args(argv)

    ds = GridDataset(args.data)
    _, val_ids = data_split(ds.ids, n=None, n_rot=args.nrot)
    model, variables = common.load_unet(
        UNetConfig(num_classes=args.num_classes), args.unet_ckpt,
        grid_d=args.d,
    )

    C = args.num_classes

    from icsg3d_tpu.train.vae import _assemble_x

    @jax.jit
    def stats_step(batch):
        x = _assemble_x(dict(batch), None)
        labels = batch["labels"].astype(jnp.int32)
        binary = (labels != 0).astype(jnp.int32)
        soft, sig = model.apply(variables, x, train=False)
        probs = jax.nn.softmax(soft, axis=-1)
        pred = jnp.argmax(probs, axis=-1)
        fg = labels != 0
        correct = pred == labels
        # reference round-based metrics (label form == one-hot form, tested)
        ref_f1 = M.f1_score_from_labels(labels, probs)
        wrec = M.weighted_recall_from_labels(labels, probs)
        # per-class confusion: tp / pred-count / true-count via bincounts
        tp = jnp.zeros(C).at[labels.reshape(-1)].add(
            correct.reshape(-1).astype(jnp.float32)
        )
        n_true = jnp.zeros(C).at[labels.reshape(-1)].add(1.0)
        n_pred = jnp.zeros(C).at[pred.reshape(-1)].add(1.0)
        # binary occupancy head at the pipeline threshold
        occ = (jax.nn.sigmoid(sig[..., 0]) > 0.8).astype(jnp.int32)
        inter = jnp.sum((occ > 0) & (binary > 0))
        union = jnp.sum((occ > 0) | (binary > 0))
        return {
            "ref_f1": ref_f1,
            "weighted_recall": wrec,
            "acc_all": jnp.mean(correct),
            "acc_fg": jnp.sum(correct & fg) / jnp.maximum(jnp.sum(fg), 1),
            "acc_bg": jnp.sum(correct & ~fg) / jnp.maximum(jnp.sum(~fg), 1),
            "fg_frac": jnp.mean(fg),
            "tp": tp, "n_true": n_true, "n_pred": n_pred,
            "occ_inter": inter, "occ_union": union,
        }

    agg = None
    n_batches = 0
    it = BatchIterator(
        ds, val_ids, args.batch_size,
        fields=("density", "lattice", "species"), shuffle=False, seed=0,
    )
    for b in it:
        batch = prepare_unet_batch(b, C, device_coords=True)
        out = jax.device_get(stats_step(batch))
        if agg is None:
            agg = {k: np.asarray(v, np.float64) for k, v in out.items()}
        else:
            for k, v in out.items():
                agg[k] += np.asarray(v, np.float64)
        n_batches += 1

    scalars = (
        "ref_f1", "weighted_recall", "acc_all", "acc_fg", "acc_bg", "fg_frac"
    )
    result = {k: round(float(agg[k] / n_batches), 4) for k in scalars}
    result["occupancy_iou"] = round(
        float(agg["occ_inter"] / max(agg["occ_union"], 1)), 4
    )
    tp, n_true, n_pred = agg["tp"], agg["n_true"], agg["n_pred"]
    per_class = []
    for c in range(C):
        if n_true[c] == 0 and n_pred[c] == 0:
            continue
        prec = tp[c] / n_pred[c] if n_pred[c] else 0.0
        rec = tp[c] / n_true[c] if n_true[c] else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        per_class.append(
            {
                "class": int(c), "support": int(n_true[c]),
                "precision": round(float(prec), 4),
                "recall": round(float(rec), 4),
                "f1": round(float(f1), 4),
            }
        )
    present = [r for r in per_class if r["class"] != 0 and r["support"] > 0]
    result["n_val_samples"] = len(val_ids)
    result["n_species_classes_present"] = len(present)
    result["macro_f1_present_classes"] = round(
        float(np.mean([r["f1"] for r in present])), 4
    ) if present else None
    result["per_class"] = per_class

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "per_class"},
                     indent=1))
    for r in per_class:
        print(r)


if __name__ == "__main__":
    main()
