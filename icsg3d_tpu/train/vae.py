"""Conditional DFC-VAE training: jitted DP steps + driver loop.

Reference flow (train_vae.py + vae/lattice_vae.py:272-342): custom epoch
loop, loss = MSE + alpha*perceptual + beta*KLD where the perceptual term
compares U-Net intermediate ReLU activations of input vs reconstruction
(vae/lattice_vae.py:241-270).  The trained U-Net's variables ride along as
a frozen constant of the jitted step — the whole VAE fwd + two perceptual
U-Net forwards + backward is one XLA program.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from icsg3d_tpu.config import TrainConfig, VAEConfig
from icsg3d_tpu.models.unet import UNet3D
from icsg3d_tpu.models.vae import ConditionalDFCVAE
from icsg3d_tpu.ops import losses
from icsg3d_tpu.data.store import prefetch_to_device
from icsg3d_tpu.parallel import batch_sharding, make_mesh
from icsg3d_tpu.train.checkpoints import CheckpointManager
from icsg3d_tpu.train.state import ModelState


def create_vae_state(
    cfg: VAEConfig, train_cfg: TrainConfig, rng, abstract: bool = False,
    spatial_mesh=None,
) -> Tuple[ConditionalDFCVAE, ModelState]:
    """abstract=True builds a host-only zeros skeleton (no device init) —
    for states about to be overwritten by a checkpoint restore.

    spatial_mesh routes the ndcs-layout convs through the halo-sharded
    Pallas path (models/layers.py SpatialMajorConv.spatial_mesh)."""
    model = ConditionalDFCVAE(cfg, spatial_mesh=spatial_mesh)
    d = cfg.grid.d
    tx = optax.adam(train_cfg.learning_rate)

    def init():
        # everything device-touching stays inside: eval_shape traces this
        # for free on the abstract path
        x = jnp.zeros((1, d, d, d, cfg.grid.channels), jnp.float32)
        cond = jnp.zeros((1, cfg.cond_bins), jnp.float32)
        init_rng, sample_rng = jax.random.split(jax.random.fold_in(rng, 0))
        return model.init(init_rng, x, cond, sample_rng, train=False)
    if abstract:
        return model, ModelState.create_abstract(model.apply, init, tx)
    return model, ModelState.create(model.apply, init(), tx)


def _perceptual_features(unet: UNet3D, unet_variables, x, taps):
    """Post-ReLU activations of the given conv indices, inside jit.

    Delegates to models.unet.unet_features (single owner of the tap
    protocol); the U-Net truncates at max(taps) so the decoder tail
    (~80% of its FLOPs at 32^3) never compiles into the DFC loss.
    """
    from icsg3d_tpu.models.unet import unet_features

    return unet_features(unet, unet_variables, x, taps)


def _assemble_x(batch, grid):
    """Model input from a batch carrying "x" grids, density+"coords"
    channels, or density+lattice lengths.

    With "abc" the coordinate channels are rebuilt ON DEVICE from the
    lattice lengths — coordinate_grid is pure math (utils.py:88-94), so for
    non-rotated datasets there is no reason to ship 3 float32 channels per
    sample over PCIe/the tunnel when 3 scalars suffice (4x less H2D).  With
    "coords" (rotated datasets) the channels ship as-is and concatenate to
    the (possibly float16-shipped) density in-graph.
    """
    if "x" in batch:
        return batch["x"].astype(jnp.float32)
    density = batch["density"][..., None].astype(jnp.float32)
    if "coords" in batch:
        return jnp.concatenate(
            [density, batch["coords"].astype(jnp.float32)], axis=-1
        )
    from icsg3d_tpu.config import GridSpec
    from icsg3d_tpu.ops.voxelize import coordinate_grid

    if grid is None:  # infer geometry from the density grid (default eps)
        grid = GridSpec(d=batch["density"].shape[1])
    coords = jax.vmap(lambda abc: coordinate_grid(abc, grid))(batch["abc"])
    return jnp.concatenate([density, coords], axis=-1)


def _vae_losses(
    model, unet, unet_variables, params, batch_stats, batch, rng,
    train: bool, remat_perceptual: bool = False,
):
    cfg = model.cfg
    batch = dict(batch)
    # Pre-gathered true-grid perceptual features (cache_true_features):
    # the U-Net is FROZEN and the dataset fixed, so f_true is a
    # per-sample constant — when the batch carries pfeat_<tap> entries
    # (gathered from the epoch-invariant cache) the true-side U-Net
    # forward is skipped entirely.  Bitwise-identical loss either way
    # (tests/test_train.py::TestCachedFeatures).
    pf_keys = [f"pfeat_{i}" for i in cfg.perceptual_taps]
    f_true_cached = (
        [batch[k] for k in pf_keys]
        if all(k in batch for k in pf_keys)
        else None
    )
    batch["x"] = _assemble_x(batch, cfg.grid)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        (recon, z_mean, z_log_var, _), new_state = model.apply(
            variables, batch["x"], batch["cond"], rng, train=True,
            mutable=["batch_stats"],
        )
        new_bs = new_state["batch_stats"]
    else:
        recon, z_mean, z_log_var, _ = model.apply(
            variables, batch["x"], batch["cond"], rng, train=False
        )
        new_bs = batch_stats

    mse = losses.mse_flat(batch["x"], recon)
    kld = losses.kld_gaussian(z_mean, z_log_var)
    if unet is not None:
        # the true-grid forward carries no gradient (frozen net, constant
        # input) so XLA stores nothing for it; only the recon forward's
        # activations survive to the backward pass — remat_perceptual
        # recomputes that one forward instead (64^3 memory relief)
        pred_feats = lambda xx: _perceptual_features(  # noqa: E731
            unet, unet_variables, xx, cfg.perceptual_taps
        )
        if remat_perceptual:
            pred_feats = jax.checkpoint(pred_feats)
        f_true = (
            f_true_cached
            if f_true_cached is not None
            else _perceptual_features(
                unet, unet_variables, batch["x"], cfg.perceptual_taps
            )
        )
        f_pred = pred_feats(recon)
        pm = losses.perceptual_feature_loss(
            f_true, f_pred, cfg.perceptual_tap_weights
        )
    else:
        pm = jnp.zeros_like(mse)
    kld_term = (
        jnp.maximum(kld, cfg.kld_floor) if cfg.kld_floor > 0 else kld
    )
    total = jnp.mean(mse + cfg.alpha * pm + cfg.beta * kld_term)
    mets = {
        "loss": total,
        "mse": jnp.mean(mse),
        "perceptual": jnp.mean(pm),
        "kld": jnp.mean(kld),
    }
    return total, (mets, new_bs)


def make_vae_steps(
    model: ConditionalDFCVAE,
    unet: Optional[UNet3D] = None,
    unet_variables=None,
    remat_perceptual: bool = False,
    resident: bool = False,
):
    """Build (train_step, eval_step).

    unet=None trains a plain (non-DFC) conditional VAE — useful before a
    U-Net artifact exists (the reference hard-required one,
    vae/lattice_vae.py:120).

    remat_perceptual=True recomputes the recon-side frozen perceptual
    forward in the backward pass instead of storing its activations —
    a memory/batch-size lever for 64^3 grids.

    resident=True builds steps for an HBM-resident dataset: they take
    (state, data, idx, rng) where `data` is the whole split already on
    device and `idx` is the batch's row indices; the batch gathers
    INSIDE the jitted program (one HBM copy, no host traffic, no eager
    dispatch).  See train_vae's resident_data parameter.
    """

    def _gather(data, idx):
        return {k: v[idx] for k, v in data.items()}

    def train_step(state: ModelState, batch, rng):
        def loss_fn(params):
            return _vae_losses(
                model, unet, unet_variables, params, state.batch_stats,
                batch, rng, train=True, remat_perceptual=remat_perceptual,
            )

        grads, (mets, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_bs), mets

    def eval_step(state: ModelState, batch, rng):
        _, (mets, _) = _vae_losses(
            model, unet, unet_variables, state.params, state.batch_stats,
            batch, rng, train=False,
        )
        return mets

    if resident:
        def train_step_resident(state, data, idx, rng):
            return train_step(state, _gather(data, idx), rng)

        def eval_step_resident(state, data, idx, rng):
            return eval_step(state, _gather(data, idx), rng)

        return (
            jax.jit(train_step_resident, donate_argnums=(0,)),
            jax.jit(eval_step_resident),
        )

    return (
        jax.jit(train_step, donate_argnums=(0,)),
        jax.jit(eval_step),
    )


def make_vae_epoch_fns(
    model: ConditionalDFCVAE,
    unet: Optional[UNet3D] = None,
    unet_variables=None,
    remat_perceptual: bool = False,
    field_shapes: Optional[dict] = None,
):
    """Whole-epoch jitted programs for an HBM-RESIDENT split.

    The per-step resident path (make_vae_steps(resident=True)) still
    round-trips the host every step: one device_put for the batch's
    index vector, one dispatch, and a deferred per-step metrics fetch —
    ~2x steps host interactions per epoch.  Over a remote/tunneled
    device plugin each of those costs an RTT, and every array created
    feeds the plugin's per-array leak (the 64^3 HBM-creep that forces
    chunked multi-process campaigns, COVERAGE.md round-4).

    These build the TPU-native alternative: the WHOLE epoch is one XLA
    program — ``lax.scan`` over the step function, gathering each batch
    from the resident split inside the loop.  Per epoch the host ships
    ONE (n_steps, batch_size) permutation array and fetches ONE dict of
    scalar metric means.  Control flow is compiler-visible (static trip
    count), the carried state is donated, and nothing else crosses the
    host boundary, so a full 250-epoch schedule can run in a single
    process.

    train_epoch(state, data, key, perm) -> (state, key', mean_metrics)
        perm: (n_steps, batch_size) int32 row indices.  Computed on the
        HOST exactly like the per-step path's shuffle
        (np.random.default_rng((shuffle_seed, epoch)).permutation) so
        the two paths see identical batch order — equivalence is
        testable and --resume runs can switch paths mid-training.
    val_epoch(state, data, key, idx) -> (key', mean_metrics)
        idx: (n_batches, batch_size) fixed evaluation rows.

    Both return the ADVANCED rng key: it is carried through the scan
    with the same ``key, sub = split(key)`` structure per step as the
    host loop, so from an identical starting key the two paths draw
    bitwise-identical reparameterization noise across the whole run
    (tests/test_train.py::TestEpochScan).

    field_shapes: per-sample shapes of resident fields stored FLAT as
    (N, prod(shape)); the gather reshapes rows back per batch.  Flat
    storage is the ns10k-scale memory fix: with the natural 5-D shapes,
    XLA relayouts the multi-GB cache/density operands for the in-loop
    gather (lane-padded temp copies — 13.7 G of HLO temps at the
    flagship config, the round-4 compile-OOM at 24.07 G vs 15.75 G HBM);
    a (N, K) layout with K a lane multiple has one natural layout, so
    the operands are gathered in place and the per-batch reshape is a
    ~MB-scale fused copy.
    """

    def _gather(data, idx):
        out = {}
        for k, v in data.items():
            g = v[idx]
            if field_shapes and k in field_shapes:
                g = g.reshape((idx.shape[0],) + tuple(field_shapes[k]))
            out[k] = g
        return out

    def _losses(params, batch_stats, batch, rng, train):
        return _vae_losses(
            model, unet, unet_variables, params, batch_stats, batch, rng,
            train=train, remat_perceptual=remat_perceptual,
        )

    def train_epoch(state: ModelState, data, key, perm):
        def body(carry, idx):
            state, key = carry
            key, sub = jax.random.split(key)

            def loss_fn(params):
                return _losses(
                    params, state.batch_stats, _gather(data, idx), sub, True
                )

            grads, (mets, new_bs) = jax.grad(
                loss_fn, has_aux=True
            )(state.params)
            return (
                state.apply_gradients(grads, new_batch_stats=new_bs),
                key,
            ), mets

        (state, key), mets = jax.lax.scan(body, (state, key), perm)
        means = jax.tree_util.tree_map(
            lambda a: jnp.mean(a, axis=0), mets
        )
        return state, key, means

    def val_epoch(state: ModelState, data, key, idx):
        def body(key, rows):
            key, sub = jax.random.split(key)
            _, (mets, _) = _losses(
                state.params, state.batch_stats, _gather(data, rows), sub,
                False,
            )
            return key, mets

        key, mets = jax.lax.scan(body, key, idx)
        return key, jax.tree_util.tree_map(
            lambda a: jnp.mean(a, axis=0), mets
        )

    return (
        jax.jit(train_epoch, donate_argnums=(0,)),
        jax.jit(val_epoch),
    )


def precompute_true_features(
    model: ConditionalDFCVAE, unet: UNet3D, unet_variables,
    data_dev, batch_size: int,
    field_shapes: Optional[dict] = None,
    flat: bool = False,
):
    """True-grid perceptual tap activations for a whole resident split.

    The DFC loss compares U-Net features of the TRUE grid against the
    reconstruction's every step (vae/lattice_vae.py:241-270) — but the
    U-Net is frozen and the dataset fixed, so the true side is a
    per-sample constant recomputed identically every epoch.  This runs
    that forward ONCE per sample (one lax.map over the resident split,
    executed on device) and returns {"pfeat_<tap>": (N, ...)} device
    arrays to merge into the resident data dict; the jitted step then
    gathers feature rows with the same index vector as the data rows.

    Cost: one truncated U-Net forward per sample for the entire
    training run, vs one per sample per epoch (250x for the reference
    schedule).  HBM: ~1.24 MB/sample bf16 at 32^3 (9.9 GB for the 10k
    campaign's 8k-sample train split) — the caller gates on this.

    field_shapes: per-sample shapes of data_dev fields that are stored
    FLAT (the epoch-scan path); the per-batch unflatten happens inside
    the jit (a free bitcast).  flat=True returns each tap as (N, K) —
    also an in-jit reshape, so the multi-GB cache never exists in both
    layouts at once (an eager post-hoc reshape transiently doubled it
    and OOM'd the flagship run).  The tap shapes come back in a second
    dict for the epoch program's gather-unflatten.
    """
    cfg = model.cfg
    n = len(next(iter(data_dev.values())))
    nb = -(-n // batch_size)
    pad = nb * batch_size - n

    fields = {
        k: v for k, v in data_dev.items()
        if k in ("density", "abc", "coords", "x")
    }

    @jax.jit
    def _all_feats(fields):
        if field_shapes:
            fields = {
                k: (v.reshape((v.shape[0],) + tuple(field_shapes[k]))
                    if k in field_shapes else v)
                for k, v in fields.items()
            }
        batched = jax.tree_util.tree_map(
            lambda v: jnp.concatenate([v, v[:pad]]).reshape(
                (nb, batch_size) + v.shape[1:]
            ),
            fields,
        )

        def body(b):
            x = _assemble_x(dict(b), cfg.grid)
            return tuple(
                _perceptual_features(
                    unet, unet_variables, x, cfg.perceptual_taps
                )
            )

        feats = jax.lax.map(body, batched)
        out = tuple(
            f.reshape((nb * batch_size,) + f.shape[2:])[:n] for f in feats
        )
        if flat:
            out = tuple(f.reshape(n, -1) for f in out)
        return out

    tap_shapes = {
        f"pfeat_{tap}": tuple(t.shape[1:])
        for tap, t in zip(
            cfg.perceptual_taps,
            jax.eval_shape(
                lambda xx: _perceptual_features(
                    unet, unet_variables, xx, cfg.perceptual_taps
                ),
                jax.ShapeDtypeStruct(
                    (1, cfg.grid.d, cfg.grid.d, cfg.grid.d,
                     cfg.grid.channels),
                    jnp.float32,
                ),
            ),
        )
    }
    feats = _all_feats(fields)
    cache = {
        f"pfeat_{tap}": f
        for tap, f in zip(cfg.perceptual_taps, feats)
    }
    return (cache, tap_shapes) if flat else cache


def true_feature_cache_bytes(
    model: ConditionalDFCVAE, unet: UNet3D, unet_variables, n_samples: int,
) -> int:
    """Exact HBM bytes the feature cache would occupy for n_samples,
    from an abstract trace (no device work)."""
    cfg = model.cfg
    d = cfg.grid.d
    x = jax.ShapeDtypeStruct((1, d, d, d, cfg.grid.channels), jnp.float32)
    outs = jax.eval_shape(
        lambda xx: _perceptual_features(
            unet, unet_variables, xx, cfg.perceptual_taps
        ),
        x,
    )
    return n_samples * sum(
        int(np.prod(o.shape[1:])) * o.dtype.itemsize for o in outs
    )


def prepare_vae_batch(
    batch: Dict[str, np.ndarray], cond: np.ndarray,
    device_coords: bool = False,
    ship_dtype: str = "float32",
):
    """Raw store fields + per-sample one-hot conds -> model inputs.

    x = density + coordinate channels (vae/data.py:93-100); cond is the
    quantile-bin one-hot (vae/data.py:88-91), carried by BatchIterator's
    ``extra`` mechanism.

    device_coords=True ships only the density + lattice lengths and rebuilds
    the coordinate channels inside the jitted step (4x less host->device
    traffic).  Valid ONLY for non-rotated samples — a rotated grid's
    coordinate channels are axis-permuted and not derivable from abc.

    ship_dtype="float16" halves the density bytes on the wire; the step
    casts back to float32 on device before the (bfloat16) model compute, so
    the only loss is fp16's ~5e-4 relative rounding of a smooth Gaussian
    field.  The coordinate channels always ship float32 — they are the
    lattice-parameter regression target (to_lattice_params reads them), so
    quantizing them would bias the recovered lattice.  Epochs over a remote
    device link are transfer-bound, so this is ~2x epoch wall time.
    """
    dt = np.dtype(ship_dtype)
    if device_coords:
        return {
            "density": batch["density"].astype(dt),
            "abc": batch["lattice"][:, :3].astype(np.float32),
            "cond": cond.astype(np.float32),
        }
    return {
        "density": batch["density"].astype(dt),
        "coords": batch["coords"].astype(np.float32),
        "cond": cond.astype(np.float32),
    }


from icsg3d_tpu.train.common import mean_metrics as _mean_metrics


@functools.lru_cache(maxsize=4)
def _plot_forwards(model):
    """The two jitted plot forwards, built ONCE per model.

    These must be cached: a fresh ``jax.jit(lambda ...)`` per improvement
    epoch loads a new executable onto the device every time and the old
    ones are not reliably unloaded through the remote device plugin —
    the 64^3 resident campaign OOMed HBM after ~6 improvement epochs
    this way.  One cache entry per model = one loaded program, and
    re-improvements skip retracing entirely.
    """
    from icsg3d_tpu.models.vae import sample_prior

    recon_fn = jax.jit(
        lambda v, xx, cc: model.apply(
            v, xx, cc, jax.random.key(0), train=False
        )[:2]
    )
    # epoch rides in as an argument (not a traced-time constant) so the
    # compiled HLO is identical across improvements -> one cache entry
    sample_fn = jax.jit(
        lambda v, e: sample_prior(model, v, jax.random.key(e), n_samples=1)
    )
    return recon_fn, sample_fn


def _save_best_plots(model, state, batch, plot_dir: str, epoch: int):
    """Best-val visualization set (vae/lattice_vae.py:327-337):
    reconstructions, prior samples, latent KDE."""
    import os

    from icsg3d_tpu import viz

    os.makedirs(plot_dir, exist_ok=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = dict(batch)
    x = _assemble_x(batch, model.cfg.grid)
    # forward only what gets plotted (4 samples, not the full batch), and
    # JIT both forwards: an un-jitted apply dispatches per-op over the
    # tunnel — with per-op eager compiles through the slow remote helper —
    # and early training improves val almost every epoch, so this path
    # dominated the 64^3 campaign's wall-clock (~14 min/15-epoch chunk of
    # overhead in the round-3 60-epoch run).  The jitted programs hit the
    # persistent compile cache across chunk restarts.
    recon_fn, sample_fn = _plot_forwards(model)
    n = min(4, len(x))
    recon, z_mean = recon_fn(variables, x[:n], batch["cond"][:n])
    viz.plot_real_vs_pred(
        np.asarray(x[:n]), np.asarray(recon),
        f"{plot_dir}/reconstructions.png",
    )
    _, samples = sample_fn(variables, epoch)
    viz.plot_slices(np.asarray(samples[0]), f"{plot_dir}/samples.png")
    viz.plot_latent_kde(np.asarray(z_mean), f"{plot_dir}/latent_kde.png")


def train_vae(
    model: ConditionalDFCVAE,
    state: ModelState,
    train_batches: Optional[Callable[[], Iterable]],
    val_batches: Optional[Callable[[], Iterable]],
    epochs: int,
    unet: Optional[UNet3D] = None,
    unet_variables=None,
    checkpoint_dir: Optional[str] = None,
    mesh=None,
    seed: int = 0,
    log_fn=print,
    plot_dir: Optional[str] = None,
    latest_every: int = 1,
    remat_perceptual: bool = False,
    resident_data=None,
    batch_size: Optional[int] = None,
    shuffle_seed: int = 0,
    cache_true_features: bool = False,
    plot_min_interval: int = 1,
    epoch_scan: bool = False,
):
    """Epoch loop mirroring LatticeDFCVAE.train (vae/lattice_vae.py:288-342):
    per-epoch train/val metric means, wall-clock print, best-val save (and
    best-val plots when plot_dir is given).

    train_batches/val_batches are ZERO-ARG CALLABLES returning a fresh
    iterable per epoch (so shuffling and prefetch restart each epoch).
    remat_perceptual recomputes the recon-side frozen perceptual forward
    in the backward pass — the 64^3 memory lever (tools/opt64.py).

    resident_data=(train_dict, val_dict) switches to the HBM-RESIDENT
    path: both splits (host numpy dicts of per-sample arrays, e.g.
    density/abc/cond) upload to device ONCE, replicated over the mesh,
    and every batch gathers on device inside the jitted step from a
    per-epoch host permutation — the only per-step host->device traffic
    is the index vector.  Epochs over a remote device link are otherwise
    transfer-bound (the same dataset re-ships every epoch; measured 2-3x
    epoch wall time at 64^3).  Requires `batch_size`; `shuffle_seed`
    keys the per-epoch permutations (fold resume progress in, exactly
    like the streaming path's iterator seed).  train_batches/val_batches
    are ignored and may be None.

    epoch_scan=True (resident only) runs each epoch as ONE jitted
    lax.scan program (make_vae_epoch_fns): one permutation upload and
    one metrics fetch per epoch instead of ~2x steps host round trips.
    Batch order and rng-draw structure match the per-step resident path
    exactly, so --resume can switch between them freely.
    """
    mesh = mesh or make_mesh()
    resident = resident_data is not None
    if epoch_scan and not resident:
        raise ValueError("epoch_scan requires resident_data")
    if epoch_scan:
        # built in the resident block below, once the data dict (incl.
        # any feature cache) is known: the fields are stored FLAT and
        # the epoch programs need their per-sample shapes
        train_epoch_fn = val_epoch_fn = None
        train_step = eval_step = None
    else:
        train_step, eval_step = make_vae_steps(
            model, unet, unet_variables, remat_perceptual=remat_perceptual,
            resident=resident,
        )
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    key = jax.random.key(seed)
    history = []
    last_val_batch = None
    _last_plot_epoch = [-plot_min_interval]  # epoch 0 may plot
    if resident:
        if not batch_size:
            raise ValueError("resident_data requires batch_size")
        from jax.sharding import NamedSharding, PartitionSpec

        t_host, v_host = resident_data
        repl = NamedSharding(mesh, PartitionSpec())
        # epoch-scan: resident fields live FLAT (N, K) on device — see
        # make_vae_epoch_fns.  Flattening happens on the HOST (a free
        # numpy view) BEFORE upload, and the feature cache is emitted
        # flat from inside its jit: an eager device-side reshape of the
        # ~10 GB cache transiently doubled it and OOM'd the flagship run.
        field_shapes = {}

        def _flatten_host(dd):
            out = {}
            for k, v in dd.items():
                if v.ndim >= 3:
                    field_shapes[k] = v.shape[1:]
                    out[k] = v.reshape(v.shape[0], -1)
                else:
                    out[k] = v
            return out

        t_up = _flatten_host(t_host) if epoch_scan else t_host
        v_up = (_flatten_host(v_host) if epoch_scan else v_host) \
            if v_host else None
        t_dev = jax.device_put(t_up, repl)
        v_dev = jax.device_put(v_up, repl) if v_up else None
        if cache_true_features and unet is not None:
            if epoch_scan:
                feats, tap_shapes = precompute_true_features(
                    model, unet, unet_variables, t_dev, batch_size,
                    field_shapes=field_shapes, flat=True,
                )
                field_shapes.update(tap_shapes)
            else:
                feats = precompute_true_features(
                    model, unet, unet_variables, t_dev, batch_size
                )
            t_dev = dict(t_dev)
            # the precompute outputs are already device-resident with the
            # replicated layout on a single-chip mesh — a device_put here
            # COPIES each multi-GB tap, and with the plugin's deferred
            # frees the transient doubles stack up and OOM the scan
            # program's arena before the first epoch
            need_put = any(
                getattr(v, "sharding", None) != repl for v in feats.values()
            ) and len(mesh.devices.flat) > 1
            t_dev.update(
                {k: jax.device_put(v, repl) for k, v in feats.items()}
                if need_put else feats
            )
            log_fn(
                "cached true-grid perceptual features: "
                f"{sum(v.nbytes for v in feats.values()) / 1e9:.2f} GB "
                "HBM; true-side U-Net forward skipped every step"
            )
            del feats
        n_train = len(next(iter(t_host.values())))
        n_val = len(next(iter(v_host.values()))) if v_host else 0
        idx_sharding = batch_sharding(mesh)
        nb_val = n_val // batch_size
        nb_train = n_train // batch_size
        if nb_val:  # the plotted batch: the last full val batch, host-side
            rows = np.arange((nb_val - 1) * batch_size, nb_val * batch_size)
            last_val_batch = {k: np.asarray(v[rows]) for k, v in v_host.items()}
        if epoch_scan:
            if nb_train == 0:
                raise ValueError(
                    "no train batches: the train split is smaller than the "
                    "batch size (remainders are dropped, vae/data.py:45 "
                    "parity)"
                )
            train_epoch_fn, val_epoch_fn = make_vae_epoch_fns(
                model, unet, unet_variables,
                remat_perceptual=remat_perceptual,
                field_shapes=field_shapes,
            )
            # (n_steps, batch) index blocks: replicated over steps, each
            # step's row split over the data axis like the per-step path
            perm_sharding = NamedSharding(mesh, PartitionSpec(None, "data"))
            val_idx = (
                jax.device_put(
                    np.arange(nb_val * batch_size, dtype=np.int32).reshape(
                        nb_val, batch_size
                    ),
                    perm_sharding,
                )
                if nb_val
                else None
            )
    for epoch in range(epochs):
        t0 = time.time()
        sharding = batch_sharding(mesh)
        train_mets = []
        val_mets = []
        if resident and epoch_scan:
            perm = np.random.default_rng(
                (shuffle_seed, epoch)
            ).permutation(n_train).astype(np.int32)
            perm2d = jax.device_put(
                perm[: nb_train * batch_size].reshape(
                    nb_train, batch_size
                ),
                perm_sharding,
            )
            try:
                state, key, m = train_epoch_fn(state, t_dev, key, perm2d)
            except Exception:
                if epoch == 0:  # OOM forensics: what actually occupies HBM
                    try:
                        ms = jax.local_devices()[0].memory_stats() or {}
                        log_fn(
                            "epoch-scan failed on epoch 0; device memory: "
                            + ", ".join(
                                f"{k}={v / 1e9:.2f}G"
                                for k, v in sorted(ms.items())
                                if "bytes" in k
                            )
                        )
                    except Exception:  # stats are best-effort
                        pass
                raise
            train_mets.append(m)
            if nb_val:
                key, vm_scan = val_epoch_fn(state, v_dev, key, val_idx)
                val_mets.append(vm_scan)
        elif resident:
            perm = np.random.default_rng(
                (shuffle_seed, epoch)
            ).permutation(n_train).astype(np.int32)
            for i in range(n_train // batch_size):
                idx = jax.device_put(
                    perm[i * batch_size:(i + 1) * batch_size], idx_sharding
                )
                key, sub = jax.random.split(key)
                state, m = train_step(state, t_dev, idx, sub)
                train_mets.append(m)
            for i in range(nb_val):
                idx = jax.device_put(
                    np.arange(i * batch_size, (i + 1) * batch_size,
                              dtype=np.int32),
                    idx_sharding,
                )
                key, sub = jax.random.split(key)
                val_mets.append(eval_step(state, v_dev, idx, sub))
        else:
            for b in prefetch_to_device(train_batches(), devices=sharding):
                key, sub = jax.random.split(key)
                state, m = train_step(state, b, sub)
                train_mets.append(m)
            for b in prefetch_to_device(val_batches(), devices=sharding):
                key, sub = jax.random.split(key)
                val_mets.append(eval_step(state, b, sub))
                last_val_batch = b
        tm = _mean_metrics([jax.device_get(m) for m in train_mets])
        if not tm:
            raise ValueError(
                "no train batches: the train split is smaller than the "
                "batch size (remainders are dropped, vae/data.py:45 parity)"
            )
        vm = _mean_metrics([jax.device_get(m) for m in val_mets])
        if not vm:
            if epoch == 0:
                log_fn(
                    "warning: no val batches (val split smaller than the "
                    "batch size) — 'val' metrics below are TRAIN metrics "
                    "and best-checkpoint selection is overfitting-blind"
                )
            vm = tm
        epoch_time = time.time() - t0
        # epoch_scan folds the whole epoch into one program whose
        # metrics are already step means — count the real steps
        n_steps = nb_train if (resident and epoch_scan) else len(train_mets)
        history.append({"train": tm, "val": vm, "time": epoch_time,
                        "steps": n_steps})
        log_fn(
            f"epoch {epoch}: time {epoch_time:.2f}s "
            f"({n_steps / max(epoch_time, 1e-9):.1f} steps/s) "
            f"train loss {tm['loss']:.4f} mse {tm['mse']:.4f} "
            f"pm {tm['perceptual']:.4f} kld {tm['kld']:.2f} | "
            f"val loss {vm['loss']:.4f}"
        )
        if ckpt:
            t_save = time.time()
            improved = ckpt.save_epoch(
                state, vm["loss"], epoch, latest_every=latest_every
            )
            # plot_min_interval thins the best-val plot refreshes: early
            # training improves val nearly every epoch, and each refresh
            # ships device arrays through the leaky remote plugin (HBM
            # creep killed a 25-epoch 64^3 chunk at epoch 12) besides
            # costing 6-35 s of fetch time
            if (improved and plot_dir and last_val_batch is not None
                    and epoch - _last_plot_epoch[0] >= plot_min_interval):
                _save_best_plots(model, state, last_val_batch, plot_dir, epoch)
                _last_plot_epoch[0] = epoch
            t_save = time.time() - t_save
            if t_save > 5:  # surface the remote-fetch/plot tax (it is
                # outside the printed epoch time, so a silent sink)
                log_fn(f"  [post-epoch] ckpt+plots {t_save:.1f}s")
    if (ckpt and epochs > 0 and latest_every > 1
            and ckpt.last_latest_epoch != epochs - 1):
        ckpt.save_latest(state)  # final save so --resume continues from the end
    return state, history
