"""Conditional DFC-VAE training CLI.

Reference: train_vae.py (defaults: batch 20, lr 5e-4, 250 epochs,
alpha=0.5, beta=3e-4; requires a trained U-Net for the perceptual loss).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from icsg3d_tpu.config import GridSpec, TrainConfig, UNetConfig, VAEConfig
from icsg3d_tpu.apps import common
from icsg3d_tpu.data.binning import bin_and_encode
from icsg3d_tpu.data.splits import data_split
from icsg3d_tpu.data.store import BatchIterator, GridDataset
from icsg3d_tpu.parallel import make_mesh
from icsg3d_tpu.train.vae import create_vae_state, prepare_vae_batch, train_vae


def main(argv=None):
    p = argparse.ArgumentParser(description="Train the conditional DFC-VAE")
    p.add_argument("--data", required=True)
    p.add_argument("--unet-ckpt", default=None,
                   help="trained U-Net checkpoint dir for the DFC loss")
    p.add_argument("--samples", type=int, default=None)
    p.add_argument("--epochs", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--d", type=int, default=None,
                   help="grid resolution; default: read from the dataset")
    p.add_argument("--latent", type=int, default=256)
    p.add_argument("--filters", default="16,32,64,128",
                   help="comma-separated encoder filter blocks; the grid is "
                        "halved once per block, so small --d needs fewer")
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--beta", type=float, default=3e-4)
    p.add_argument("--kld-floor", type=float, default=0.0,
                   help="free-bits floor on the per-sample KLD (nats): the "
                        "beta term becomes beta*max(kld, floor), so the "
                        "prior stops compressing below the floor; 0 = off "
                        "(exact reference loss)")
    p.add_argument("--cond-bins", type=int, default=10)
    p.add_argument("--cond-repeat", type=int, default=1,
                   help="channel-repeat of the condition block; 4 "
                        "reproduces the reference's Keras tile quirk "
                        "(44-channel encoder, vae/lattice_vae.py:166-169)")
    p.add_argument("--num-classes", type=int, default=95)
    p.add_argument("--nrot", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--layout", default="ndhwc", choices=["ndhwc", "ndcs"],
                   help="activation layout: ndcs runs large-plane conv "
                        "blocks on the tap-packed Pallas kernel "
                        "(ops/lowc_conv.py); checkpoints are layout-"
                        "interchangeable")
    p.add_argument("--spatial", type=int, default=1,
                   help="spatial mesh axis size: shards grid depth over "
                        "this many devices (halo-exchanged Pallas path "
                        "for --layout ndcs, GSPMD for ndhwc)")
    p.add_argument("--remat-perceptual", action="store_true",
                   help="recompute the recon-side frozen perceptual "
                        "forward in the backward pass — trades FLOPs for "
                        "activation memory at 64^3 (tools/opt64.py)")
    p.add_argument("--ship-dtype", default="float16",
                   choices=("float32", "float16"),
                   help="wire dtype for density grids (cast to float32 on "
                        "device; float16 halves host->device bytes)")
    p.add_argument("--cache-true-features", action="store_true",
                   help="precompute the frozen U-Net's true-grid perceptual "
                        "taps ONCE for the resident train split and gather "
                        "them per batch - skips one of the two U-Net "
                        "forwards every step with bitwise-identical loss. "
                        "Requires --resident and --unet-ckpt; needs "
                        "~1.2 MB/sample HBM at 32^3 (gated at 12 GB)")
    p.add_argument("--epoch-scan", action="store_true",
                   help="run each epoch as ONE jitted lax.scan program "
                        "over the resident split: one permutation upload "
                        "+ one metrics fetch per epoch instead of ~2x "
                        "steps host round trips — makes single-process "
                        "full-schedule runs viable over the remote "
                        "plugin (requires --resident)")
    p.add_argument("--resident", action="store_true",
                   help="upload the whole train/val split to device HBM "
                        "once and gather batches on device (zero per-epoch "
                        "host->device traffic; requires --nrot 0 and the "
                        "split to fit HBM — 64^3 f16 is ~0.5 MB/sample)")
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="save the latest checkpoint every N epochs (best is "
                        "always saved; the full-state fetch is expensive "
                        "over a remote device link)")
    p.add_argument("--plot-every", type=int, default=1,
                   help="min epochs between best-val plot refreshes; early "
                        "training improves val nearly every epoch and each "
                        "refresh costs a device fetch (and leaks through "
                        "the remote plugin)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --ckpt")
    p.add_argument("--ckpt", default="checkpoints/vae")
    p.add_argument("--verbose-startup", action="store_true",
                   help="print per-stage startup timings (dataset open, "
                        "init/restore, U-Net load)")
    args = p.parse_args(argv)

    import time as _time

    _t0 = _time.time()

    def _mark(stage):
        if args.verbose_startup:
            print(f"[startup] {stage}: {_time.time() - _t0:.1f}s", flush=True)

    ds = GridDataset(args.data)
    args.d = common.resolve_grid_d(args.d, ds)
    train_ids, val_ids = data_split(ds.ids, n=args.samples, n_rot=args.nrot)
    _mark("dataset open + split")
    # trim to batch multiples (train_vae.py:108-111 semantics are automatic:
    # BatchIterator drops remainders)

    grid = GridSpec(d=args.d)
    cfg = VAEConfig(
        grid=grid, latent_dim=args.latent, alpha=args.alpha, beta=args.beta,
        kld_floor=args.kld_floor,
        cond_bins=args.cond_bins, filters=common.parse_filters(args.filters),
        layout=args.layout, cond_repeat=args.cond_repeat,
    )
    mesh = make_mesh(n_spatial=args.spatial)
    n_data = mesh.shape["data"]
    if args.batch_size % n_data:
        p.error(
            f"--batch-size {args.batch_size} must be divisible by the "
            f"data mesh axis ({n_data} devices)"
        )
    # the ndcs Pallas conv needs the explicit shard_map path to shard over
    # the spatial axis; pure-DP ndcs and all ndhwc sharding go via GSPMD
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
    model, state = create_vae_state(
        cfg, tc, jax.random.key(args.seed), abstract=resuming,
        spatial_mesh=conv_mesh,
    )
    _mark("vae init")
    if resuming:
        state = _ck.restore(state, "latest")
        print(f"resumed from {args.ckpt}/latest at step {int(state.step)}")
        # epochs actually IN this checkpoint — _finish truncates any
        # prior-history tail beyond it (a crash can leave `latest` up to
        # ckpt_every-1 epochs behind history.json, and the resumed run
        # re-trains those epochs; appending without truncation
        # double-counted them — ADVICE r4)
        args._resumed_epochs = int(state.step) // max(
            1, len(train_ids) // args.batch_size
        )
        _mark("resume restore")

    unet = unet_vars = None
    if args.unet_ckpt:
        unet, unet_vars = common.load_unet(
            UNetConfig(num_classes=args.num_classes), args.unet_ckpt,
            grid_d=args.d,
        )
        _mark("unet load")

    _, conds, _ = bin_and_encode(
        np.asarray(ds.arrays["target"]), args.cond_bins
    )

    device_coords = args.nrot == 0
    fields = ("density", "lattice") if device_coords else ("density", "coords")

    if args.cache_true_features and not (args.resident and unet):
        p.error("--cache-true-features requires --resident and --unet-ckpt")
    if args.epoch_scan and not args.resident:
        p.error("--epoch-scan requires --resident")

    if args.resident:
        if not device_coords:
            p.error("--resident requires --nrot 0: rotated samples carry "
                    "axis-permuted coordinate channels that cannot rebuild "
                    "on device and would 5x the resident bytes")
        if args.cache_true_features:
            from icsg3d_tpu.train.vae import true_feature_cache_bytes

            need = true_feature_cache_bytes(model, unet, unet_vars,
                                            len(train_ids))
            if need > 12e9:
                p.error(
                    f"--cache-true-features needs {need / 1e9:.1f} GB HBM "
                    f"for {len(train_ids)} samples (gate: 12 GB) - use a "
                    "smaller --samples or drop the flag"
                )
            if args.epoch_scan:
                # The whole-epoch scan program's temp arena must coexist
                # with the cache: measured 5.47 G at bs=128/32^3
                # (tools/scan_mem_probe.py --flat; scales ~linearly with
                # batch and ~d^3), and three hardware attempts at the
                # flagship 9.96 G-cache config OOM'd at execution with
                # <0.5 G margin on the 15.75 G chip.  When cache + split
                # + temps don't fit, drop the cache and say why — the
                # scan path still wins (it removes the ~2-RTT/step host
                # tax that dominates chunked epochs); the extra true-side
                # perceptual forward is the cheaper loss.
                hbm = 15.75e9
                temp_est = 5.5e9 * (tc.batch_size / 128.0) * (
                    args.d / 32.0) ** 3
                split_bytes = (
                    len(train_ids) * args.d ** 3
                    * np.dtype(args.ship_dtype).itemsize
                )
                budget = hbm - temp_est - split_bytes - 1.0e9  # slack
                if need > budget:
                    print(
                        f"--cache-true-features disabled for --epoch-scan: "
                        f"cache {need / 1e9:.2f} GB > budget "
                        f"{budget / 1e9:.2f} GB (HBM {hbm / 1e9:.2f} - scan "
                        f"temps ~{temp_est / 1e9:.2f} - resident split "
                        f"{split_bytes / 1e9:.2f} - 1.0 slack); the "
                        "true-side perceptual forward runs per step instead"
                    )
                    args.cache_true_features = False

        def split_host(ids):
            rows = np.array([ds.index[i] for i in ids])
            return {
                "density": np.asarray(ds.arrays["density"][rows]).astype(
                    np.dtype(args.ship_dtype)
                ),
                "abc": np.asarray(
                    ds.arrays["lattice"][rows, :3], dtype=np.float32
                ),
                "cond": conds[rows].astype(np.float32),
            }

        t_host, v_host = split_host(train_ids), split_host(val_ids)
        _mark("resident split materialize")
        state, history = train_vae(
            model, state, None, None,
            epochs=args.epochs,
            unet=unet,
            unet_variables=unet_vars,
            checkpoint_dir=args.ckpt,
            mesh=mesh,
            seed=args.seed,
            plot_dir=os.path.join(args.ckpt, "plots"),
            latest_every=args.ckpt_every,
            plot_min_interval=args.plot_every,
            remat_perceptual=args.remat_perceptual,
            resident_data=(t_host, v_host),
            epoch_scan=args.epoch_scan,
            batch_size=args.batch_size,
            shuffle_seed=args.seed + int(state.step),
            cache_true_features=args.cache_true_features,
        )
        _finish(args, history)
        return

    def batches(ids, shuffle, seed):
        rows_cond = np.stack([conds[ds.index[i]] for i in ids])
        # ONE iterator shared across epochs: its rng advances on every
        # __iter__, so each epoch sees a fresh permutation.  (Building a
        # new BatchIterator per epoch resets the rng to `seed` and
        # silently replays the identical batch order all training long.)
        it = BatchIterator(
            ds, ids, args.batch_size, fields=fields,
            shuffle=shuffle, seed=seed, extra={"cond": rows_cond},
        )

        def gen():
            for b in it:
                yield prepare_vae_batch(
                    b, b["cond"], device_coords=device_coords,
                    ship_dtype=args.ship_dtype,
                )

        return gen

    state, history = train_vae(
        model, state,
        # fold resume progress into the shuffle seed: chunked --resume
        # runs would otherwise replay the same permutation sequence
        batches(train_ids, True, args.seed + int(state.step)),
        batches(val_ids, False, 0),
        epochs=args.epochs,
        unet=unet,
        unet_variables=unet_vars,
        checkpoint_dir=args.ckpt,
        mesh=mesh,
        seed=args.seed,
        plot_dir=os.path.join(args.ckpt, "plots"),
        latest_every=args.ckpt_every,
        plot_min_interval=args.plot_every,
        remat_perceptual=args.remat_perceptual,
    )

    _finish(args, history)


def _finish(args, history):
    from icsg3d_tpu import viz

    os.makedirs(args.ckpt, exist_ok=True)
    import json as _json

    # --resume runs APPEND to the existing history so chunked campaigns
    # (tools/campaign_*.sh: fresh process per 10-25 epochs, axon RAM
    # leak) accumulate the full training curve in one place instead of
    # each chunk overwriting the file with its own few epochs.
    hist_path = os.path.join(args.ckpt, "history.json")
    if args.resume and os.path.exists(hist_path):
        try:
            with open(hist_path) as f:
                prev = _json.load(f)
            # truncate to the resumed checkpoint's epoch count: entries
            # beyond it were re-trained by this run (crash between
            # latest-saves) and would double-count
            done = getattr(args, "_resumed_epochs", None)
            if done is not None:
                prev = prev[:done]
            history = prev + history
        except (ValueError, OSError):
            pass  # unreadable prior history: keep this chunk's alone
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
