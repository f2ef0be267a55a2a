"""Controlled probe for the round-3 U-Net loss-scale anomaly.

Hypothesis (COVERAGE.md round-3 campaign note): the weighted-CCE VALUE
scales with the inverse-frequency class-weight vector, which depends on
the data build — so round-2 (0.0216) vs round-3 (0.350) val losses at
matching f1 reflect different weight vectors, not different model quality.

The probe holds EVERYTHING fixed except the weight vector: one trained
checkpoint, one validation batch set, evaluated under
  (a) weights computed from the first half of the train split,
  (b) weights computed from the second half (a stand-in for "a different
      data build" — disjoint samples, same pipeline),
  (c) the actual train-split weights (the training-time vector),
and reports weighted loss / unweighted CE / f1 under each.  CONFIRMED
means: the weighted loss moves with the vector while CE and f1 do not.

Usage:
    python tools/loss_scale_probe.py --data data/ns10k \
        --ckpt checkpoints/ns10k/unet [--nval 256] [--out probe.json]

Reference: unet/unet.py:252-258 (the weighted loss), train_unet.py:114-127
(weight computation).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from icsg3d_tpu.config import TrainConfig, UNetConfig
from icsg3d_tpu.data.class_weights import inverse_frequency_weights
from icsg3d_tpu.data.splits import data_split
from icsg3d_tpu.data.store import GridDataset
from icsg3d_tpu.train.checkpoints import CheckpointManager
from icsg3d_tpu.train.unet import (
    create_unet_state,
    make_unet_steps,
    prepare_unet_batch,
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--num-classes", type=int, default=95)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--nval", type=int, default=256)
    p.add_argument("--split-frac", type=float, default=0.8)
    p.add_argument("--nrot", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon boot hook pins "
                        "JAX_PLATFORMS=axon, so the env var alone cannot)")
    args = p.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    ds = GridDataset(args.data)
    train_ids, val_ids = data_split(
        ds.ids, frac=args.split_frac, n_rot=args.nrot
    )
    val_ids = val_ids[: args.nval]

    parents = [i for i in train_ids if "_rot_" not in i]
    half = len(parents) // 2

    def weights_of(ids):
        rows = ds.rows(ids)
        sp = np.asarray(ds.arrays["species"][rows])
        w = inverse_frequency_weights(sp, args.num_classes)
        w[0] = 0.0
        return w

    vectors = {
        "build_a_first_half": weights_of(parents[:half]),
        "build_b_second_half": weights_of(parents[half:]),
        "training_vector": weights_of(parents),
    }

    cfg = UNetConfig(num_classes=args.num_classes)
    tc = TrainConfig(batch_size=args.batch_size, learning_rate=3e-6, epochs=0)
    model, state = create_unet_state(
        cfg, tc, jax.random.key(0), int(ds.d), abstract=True
    )
    state = CheckpointManager(args.ckpt).restore(state, "best")

    rows = ds.rows(val_ids)
    raw = {
        k: np.asarray(ds.arrays[k][rows])
        for k in ("density", "coords", "species")
    }
    results = {}
    for name, w in vectors.items():
        _, eval_step = make_unet_steps(model, w)
        mets = []
        for i in range(0, len(val_ids) - args.batch_size + 1,
                       args.batch_size):
            b = prepare_unet_batch(
                {k: v[i : i + args.batch_size] for k, v in raw.items()},
                args.num_classes,
            )
            mets.append({k: np.asarray(v)
                         for k, v in eval_step(state, b).items()})
        agg = {
            k: float(np.mean([m[k] for m in mets]))
            for k in ("loss", "loss_soft", "ce", "f1")
        }
        agg["weight_vector_l1"] = float(np.sum(w))
        results[name] = agg
        print(
            f"{name:24s} weighted loss {agg['loss']:.4f} "
            f"(soft {agg['loss_soft']:.4f}) | unweighted ce {agg['ce']:.5f} "
            f"f1 {agg['f1']:.4f} | sum(w) {agg['weight_vector_l1']:.1f}"
        )

    a, b = results["build_a_first_half"], results["build_b_second_half"]
    ratio = a["loss_soft"] / max(b["loss_soft"], 1e-12)
    ce_ratio = a["ce"] / max(b["ce"], 1e-12)
    verdict = (
        "CONFIRMED: weighted loss moves with the weight vector at fixed "
        "model/data while unweighted CE does not"
        if abs(ratio - 1) > 10 * abs(ce_ratio - 1)
        else "NOT CONFIRMED: weighted loss barely moved across vectors"
    )
    print(f"soft-loss ratio a/b = {ratio:.4f}, ce ratio = {ce_ratio:.6f}")
    print(verdict)
    out = {"results": results, "soft_loss_ratio_ab": ratio,
           "ce_ratio_ab": ce_ratio, "verdict": verdict}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
