"""U-Net training CLI.

Reference: train_unet.py (defaults: batch 10, lr 3e-6, 50 epochs).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from icsg3d_tpu.apps import common

from icsg3d_tpu.config import TrainConfig, UNetConfig
from icsg3d_tpu.data.class_weights import inverse_frequency_weights
from icsg3d_tpu.data.splits import data_split
from icsg3d_tpu.data.store import BatchIterator, GridDataset
from icsg3d_tpu.parallel import make_mesh
from icsg3d_tpu.train.unet import create_unet_state, prepare_unet_batch, train_unet


def main(argv=None):
    p = argparse.ArgumentParser(description="Train the 3D U-Net segmenter")
    p.add_argument("--data", required=True)
    p.add_argument("--samples", type=int, default=None)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=10)
    p.add_argument("--lr", type=float, default=3e-6)
    p.add_argument("--d", type=int, default=None,
                   help="grid resolution; default: read from the dataset")
    p.add_argument("--num-classes", type=int, default=95)
    p.add_argument("--nrot", type=int, default=10)
    p.add_argument("--split-frac", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--layout", default="ndhwc", choices=["ndhwc", "ndcs"],
                   help="activation layout: ndcs runs large-plane conv "
                        "blocks on the tap-packed Pallas kernel; "
                        "checkpoints are layout-interchangeable")
    p.add_argument("--spatial", type=int, default=1,
                   help="spatial mesh axis size (grid-depth sharding; >1 "
                        "uses the halo-sharded Pallas path for ndcs)")
    p.add_argument("--no-class-weights", action="store_true")
    p.add_argument("--ship-dtype", default="float16",
                   choices=("float32", "float16"),
                   help="wire dtype for density grids (cast to float32 on "
                        "device; float16 halves host->device bytes)")
    p.add_argument("--epoch-scan", action="store_true",
                   help="run each epoch as ONE jitted lax.scan program "
                        "over the resident split (requires --resident; "
                        "see apps/train_vae.py)")
    p.add_argument("--resident", action="store_true",
                   help="upload the whole train/val split to device HBM "
                        "once and gather batches on device (zero per-epoch "
                        "host->device traffic; requires --nrot 0 and the "
                        "split to fit HBM)")
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="save the latest checkpoint every N epochs (best is "
                        "always saved; the full-state fetch is expensive "
                        "over a remote device link)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --ckpt")
    p.add_argument("--plot-every", type=int, default=10,
                   help="min epochs between best-val plot refreshes (each "
                        "refresh fetches device arrays and renders on the "
                        "host - measured ~56 s at 64^3 on a 1-vCPU box; "
                        "best-val CHECKPOINTS are unaffected)")
    p.add_argument("--ckpt", default="checkpoints/unet")
    args = p.parse_args(argv)

    ds = GridDataset(args.data)
    args.d = common.resolve_grid_d(args.d, ds)
    train_ids, val_ids = data_split(
        ds.ids, n=args.samples, frac=args.split_frac, n_rot=args.nrot
    )
    cfg = UNetConfig(num_classes=args.num_classes, layout=args.layout)
    mesh = make_mesh(n_spatial=args.spatial)
    n_data = mesh.shape["data"]
    if args.batch_size % n_data:
        p.error(
            f"--batch-size {args.batch_size} must be divisible by the "
            f"data mesh axis ({n_data} devices)"
        )
    conv_mesh = mesh if (args.layout == "ndcs" and args.spatial > 1) else None
    tc = TrainConfig(
        batch_size=args.batch_size, learning_rate=args.lr, epochs=args.epochs
    )
    _ck = common.checkpoint_if_exists(
        args.ckpt if args.resume else None, "latest"
    )
    resuming = _ck is not None
    # resuming: abstract (host-zeros) skeleton — skip the device init that
    # the restore would immediately overwrite
    model, state = create_unet_state(
        cfg, tc, jax.random.key(args.seed), args.d, abstract=resuming,
        spatial_mesh=conv_mesh,
    )
    if resuming:
        state = _ck.restore(state, "latest")
        print(f"resumed from {args.ckpt}/latest at step {int(state.step)}")
        # see apps/train_vae.py: _finish truncates prior history beyond
        # the checkpoint's epoch count to avoid double-counting re-trained
        # epochs after a crash between latest-saves (ADVICE r4)
        args._resumed_epochs = int(state.step) // max(
            1, len(train_ids) // args.batch_size
        )

    # inverse-frequency weights over the TRAINING split only, zero class
    # zeroed (train_unet.py:114-119)
    if args.no_class_weights:
        class_weights = None
    else:
        rows = ds.rows([i for i in train_ids if "_rot_" not in i])
        species = np.asarray(ds.arrays["species"][rows])
        class_weights = inverse_frequency_weights(species, args.num_classes)
        class_weights[0] = 0.0

    # Persist the weight vector next to the checkpoint: the weighted loss
    # VALUE scales with these weights (they depend on the data build), so
    # without this record losses are incomparable across builds/rounds —
    # the round-3 anomaly (COVERAGE.md).  On --resume a drifted vector
    # means the data build changed under the checkpoint: warn loudly.
    import json

    os.makedirs(args.ckpt, exist_ok=True)
    cw_path = os.path.join(args.ckpt, "class_weights.json")
    cw_list = None if class_weights is None else [float(w) for w in class_weights]
    if resuming and os.path.exists(cw_path):
        with open(cw_path) as f:
            prev = json.load(f).get("class_weights")
        if prev is not None and cw_list is not None and not np.allclose(
            prev, cw_list, rtol=1e-6
        ):
            rel = float(np.max(np.abs(np.array(prev) - np.array(cw_list))
                               / np.maximum(np.abs(np.array(prev)), 1e-12)))
            print(
                f"WARNING: class weights recomputed from {args.data} differ "
                f"from the vector this checkpoint was trained with (max rel "
                f"diff {rel:.3g}) — weighted losses will NOT be comparable "
                f"to earlier epochs; compare the 'ce' (unweighted) metric "
                f"instead"
            )
    with open(cw_path, "w") as f:
        json.dump(
            {"class_weights": cw_list, "num_classes": args.num_classes,
             "data": args.data, "n_weight_samples": 0 if args.no_class_weights
             else len(rows)},
            f,
        )

    # Non-rotated datasets rebuild coordinate channels on device (4x less
    # host->device traffic); rotated grids must ship their permuted coords.
    device_coords = args.nrot == 0
    fields = (
        ("density", "lattice", "species") if device_coords
        else ("density", "coords", "species")
    )

    if args.epoch_scan and not args.resident:
        p.error("--epoch-scan requires --resident")
    if args.resident:
        if not device_coords:
            p.error("--resident requires --nrot 0: rotated samples carry "
                    "axis-permuted coordinate channels that cannot rebuild "
                    "on device and would 5x the resident bytes")

        def split_host(ids):
            rows = np.array([ds.index[i] for i in ids])
            raw = {k: np.asarray(ds.arrays[k][rows]) for k in fields}
            return prepare_unet_batch(
                raw, args.num_classes, device_coords=True,
                ship_dtype=args.ship_dtype,
            )

        state, history = train_unet(
            model, state, None, None,
            epochs=args.epochs,
            class_weights=class_weights,
            checkpoint_dir=args.ckpt,
            mesh=mesh,
            plot_dir=os.path.join(args.ckpt, "plots"),
            latest_every=args.ckpt_every,
            resident_data=(split_host(train_ids), split_host(val_ids)),
            epoch_scan=args.epoch_scan,
            batch_size=args.batch_size,
            shuffle_seed=args.seed + int(state.step),
            plot_min_interval=args.plot_every,
        )
        _finish(args, history)
        return

    def batches(ids, shuffle, seed):
        # one iterator shared across epochs — its rng advances per
        # __iter__ so every epoch reshuffles (a fresh BatchIterator per
        # epoch would replay the same order; see apps/train_vae.py)
        it = BatchIterator(
            ds, ids, args.batch_size, fields=fields,
            shuffle=shuffle, seed=seed,
        )

        def gen():
            for b in it:
                yield prepare_unet_batch(
                    b, args.num_classes, device_coords=device_coords,
                    ship_dtype=args.ship_dtype,
                )

        return gen

    state, history = train_unet(
        model, state,
        # fold resume progress into the shuffle seed: chunked --resume
        # runs would otherwise replay the same permutation sequence
        batches(train_ids, True, args.seed + int(state.step)),
        batches(val_ids, False, 0),
        epochs=args.epochs,
        class_weights=class_weights,
        checkpoint_dir=args.ckpt,
        mesh=mesh,
        plot_dir=os.path.join(args.ckpt, "plots"),
        latest_every=args.ckpt_every,
        plot_min_interval=args.plot_every,
    )

    _finish(args, history)


def _finish(args, history):
    from icsg3d_tpu import viz

    os.makedirs(args.ckpt, exist_ok=True)
    import json as _json

    # --resume appends to the existing curve (chunked-campaign parity
    # with apps/train_vae.py — see the note there)
    hist_path = os.path.join(args.ckpt, "history.json")
    if args.resume and os.path.exists(hist_path):
        try:
            with open(hist_path) as f:
                prev = _json.load(f)
            done = getattr(args, "_resumed_epochs", None)
            if done is not None:
                prev = prev[:done]
            history = prev + history
        except (ValueError, OSError):
            pass
    viz.plot_losses(
        [h["train"]["loss"] for h in history],
        [h["val"]["loss"] for h in history],
        os.path.join(args.ckpt, "loss.png"),
    )
    with open(hist_path, "w") as f:
        _json.dump(history, f, indent=1)
    if history:
        print(f"done; best val loss "
              f"{min(h['val']['loss'] for h in history):.4f} -> {args.ckpt}")
    else:
        print(f"done; 0 epochs ran -> {args.ckpt}")


if __name__ == "__main__":
    main()
