"""Training-layer tests: steps reduce loss, checkpoints round-trip, drivers
run end-to-end on synthetic data over the virtual device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icsg3d_tpu.config import (
    CGCNNConfig,
    GridSpec,
    TrainConfig,
    UNetConfig,
    VAEConfig,
    VoxelizerConfig,
)
from icsg3d_tpu.data import BatchIterator
from icsg3d_tpu.data.binning import bin_and_encode
from icsg3d_tpu.data.synthetic import build_dataset
from icsg3d_tpu.parallel import make_mesh, shard_batch
from icsg3d_tpu.train import (
    CheckpointManager,
    create_cgcnn_state,
    create_unet_state,
    create_vae_state,
    make_cgcnn_steps,
    make_unet_steps,
    make_vae_steps,
    train_unet,
    train_vae,
)
from icsg3d_tpu.train.unet import prepare_unet_batch
from icsg3d_tpu.train.vae import prepare_vae_batch

GRID = GridSpec(d=8)
UNET_CFG = UNetConfig(num_classes=12, dtype="float32")
VAE_CFG = VAEConfig(grid=GRID, filters=(4, 8), latent_dim=8, dtype="float32")
TC = TrainConfig(batch_size=4, learning_rate=1e-3)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = tmp_path_factory.mktemp("ds") / "synth"
    return build_dataset(
        str(path), n=8, cfg=VoxelizerConfig(grid=GRID, site_pad=16)
    )


def unet_batches(dataset, num_classes):
    def gen():
        it = BatchIterator(
            dataset, dataset.ids, 4, fields=("density", "coords", "species")
        )
        for b in it:
            # squash species labels into [0, num_classes)
            b["species"] = np.minimum(b["species"], num_classes - 1)
            yield prepare_unet_batch(b, num_classes)

    return gen


class TestUNetTraining:
    def test_loss_decreases(self, dataset):
        model, state = create_unet_state(UNET_CFG, TC, jax.random.key(0), grid_d=8)
        train_step, eval_step = make_unet_steps(model)
        mesh = make_mesh(n_data=4)
        batches = list(unet_batches(dataset, UNET_CFG.num_classes)())
        first = None
        for i in range(6):
            b = shard_batch(batches[i % len(batches)], mesh)
            state, mets = train_step(state, b)
            if first is None:
                first = float(mets["loss"])
        assert float(mets["loss"]) < first
        em = eval_step(state, shard_batch(batches[0], mesh))
        assert np.isfinite(float(em["loss"]))

    def test_driver_and_checkpointing(self, dataset, tmp_path):
        model, state = create_unet_state(UNET_CFG, TC, jax.random.key(0), grid_d=8)
        gen = unet_batches(dataset, UNET_CFG.num_classes)
        state, history = train_unet(
            model, state, gen, gen, epochs=2,
            checkpoint_dir=str(tmp_path / "ckpt"), mesh=make_mesh(n_data=4),
            log_fn=lambda *_: None,
        )
        assert len(history) == 2
        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        assert ckpt.has("best") and ckpt.has("latest")
        # restore into a fresh state
        _, fresh = create_unet_state(UNET_CFG, TC, jax.random.key(1), grid_d=8)
        restored = ckpt.restore(fresh, "best")
        l1 = jax.tree_util.tree_leaves(state.params)
        l2 = jax.tree_util.tree_leaves(restored.params)
        # best was saved at some epoch; params must be real arrays, finite
        assert all(np.isfinite(np.asarray(x)).all() for x in l2)
        assert len(l1) == len(l2)


class TestVAETraining:
    def test_loss_decreases_no_dfc(self, dataset):
        model, state = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        train_step, _ = make_vae_steps(model)
        mesh = make_mesh(n_data=4)
        _, cond, _ = bin_and_encode(
            np.asarray(dataset.arrays["target"]), VAE_CFG.cond_bins
        )
        it = BatchIterator(
            dataset, dataset.ids, 4, fields=("density", "coords"),
            extra={"cond": cond},
        )
        batches = [prepare_vae_batch(b, b["cond"]) for b in it]
        key = jax.random.key(0)
        first = None
        for i in range(8):
            key, sub = jax.random.split(key)
            state, mets = train_step(
                state, shard_batch(batches[i % len(batches)], mesh), sub
            )
            if first is None:
                first = float(mets["loss"])
        assert float(mets["loss"]) < first
        assert float(mets["kld"]) >= 0

    def test_kld_floor_free_bits(self, dataset):
        """With kld_floor above the operating KLD, the total gains exactly
        beta*(floor - kld) and the KLD gradient pressure vanishes (the
        metrics still report the TRUE kld, not the floored term)."""
        from icsg3d_tpu.train.vae import _vae_losses

        _, cond, _ = bin_and_encode(
            np.asarray(dataset.arrays["target"]), VAE_CFG.cond_bins
        )
        it = BatchIterator(
            dataset, dataset.ids, 4, fields=("density", "coords"),
            extra={"cond": cond},
        )
        batch = prepare_vae_batch(next(iter(it)), next(iter(it))["cond"])
        rng = jax.random.key(3)

        def total(cfg):
            model, state = create_vae_state(cfg, TC, jax.random.key(0))
            t, (mets, _) = _vae_losses(
                model, None, None, state.params, state.batch_stats,
                batch, rng, train=False,
            )
            return float(t), {k: float(v) for k, v in mets.items()}

        base, mets0 = total(VAE_CFG)
        # well above every per-sample KLD so mean(max(kld_i, floor)) == floor
        floor = mets0["kld"] + 100.0
        import dataclasses

        floored, mets1 = total(
            dataclasses.replace(VAE_CFG, kld_floor=floor)
        )
        # same params/batch/rng -> identical mse/pm/kld; the only delta is
        # the floored beta term
        assert np.isclose(mets1["kld"], mets0["kld"], rtol=1e-5)
        assert np.isclose(
            floored - base, VAE_CFG.beta * (floor - mets0["kld"]), rtol=1e-4
        )

    def test_dfc_loss_uses_unet(self, dataset):
        """With a perceptual net attached the loss gains a nonzero PM term."""
        vae_cfg = VAE_CFG
        model, state = create_vae_state(vae_cfg, TC, jax.random.key(0))
        unet, ustate = create_unet_state(UNET_CFG, TC, jax.random.key(1), grid_d=8)
        train_step, _ = make_vae_steps(
            model, unet, {"params": ustate.params, "batch_stats": ustate.batch_stats}
        )
        _, cond, _ = bin_and_encode(
            np.asarray(dataset.arrays["target"]), vae_cfg.cond_bins
        )
        it = BatchIterator(
            dataset, dataset.ids, 4, fields=("density", "coords"),
            extra={"cond": cond},
        )
        batch = prepare_vae_batch(next(iter(it)), next(iter(it))["cond"])
        mesh = make_mesh(n_data=4)
        state, mets = train_step(state, shard_batch(batch, mesh), jax.random.key(2))
        assert float(mets["perceptual"]) > 0

    def test_driver(self, dataset, tmp_path):
        model, state = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        _, cond, _ = bin_and_encode(
            np.asarray(dataset.arrays["target"]), VAE_CFG.cond_bins
        )

        def gen():
            it = BatchIterator(
                dataset, dataset.ids, 4, fields=("density", "coords"),
                extra={"cond": cond},
            )
            for b in it:
                yield prepare_vae_batch(b, b["cond"])

        state, history = train_vae(
            model, state, gen, gen, epochs=2,
            checkpoint_dir=str(tmp_path / "ck"), mesh=make_mesh(n_data=4),
            log_fn=lambda *_: None,
        )
        assert len(history) == 2
        assert np.isfinite(history[-1]["val"]["loss"])


class TestResidentVAE:
    """HBM-resident dataset path: on-device gathers must equal streamed
    batches, and the resident driver must run end-to-end on the mesh."""

    def _cond(self, dataset):
        _, cond, _ = bin_and_encode(
            np.asarray(dataset.arrays["target"]), VAE_CFG.cond_bins
        )
        return cond

    def _host_split(self, dataset, cond):
        rows = np.arange(len(dataset.ids))
        return {
            "density": np.asarray(
                dataset.arrays["density"][rows], dtype=np.float32
            ),
            "abc": np.asarray(
                dataset.arrays["lattice"][rows, :3], dtype=np.float32
            ),
            "cond": cond[rows].astype(np.float32),
        }

    def test_eval_matches_streaming(self, dataset):
        from jax.sharding import NamedSharding, PartitionSpec

        model, state = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        _, eval_stream = make_vae_steps(model)
        _, eval_res = make_vae_steps(model, resident=True)
        cond = self._cond(dataset)
        data = self._host_split(dataset, cond)
        mesh = make_mesh(n_data=4)
        data_dev = jax.device_put(
            data, NamedSharding(mesh, PartitionSpec())
        )
        rows = np.array([1, 3, 4, 6], dtype=np.int32)
        raw = {
            "density": data["density"][rows],
            "lattice": np.asarray(dataset.arrays["lattice"][rows]),
        }
        batch = prepare_vae_batch(raw, cond[rows], device_coords=True)
        rng = jax.random.key(7)
        m_stream = eval_stream(state, shard_batch(batch, mesh), rng)
        from icsg3d_tpu.parallel import batch_sharding

        idx = jax.device_put(rows, batch_sharding(mesh))
        m_res = eval_res(state, data_dev, idx, rng)
        for k in m_stream:
            assert float(m_res[k]) == pytest.approx(
                float(m_stream[k]), rel=1e-5
            ), k

    def test_resident_driver(self, dataset, tmp_path):
        model, state = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        cond = self._cond(dataset)
        data = self._host_split(dataset, cond)
        state, history = train_vae(
            model, state, None, None, epochs=2,
            checkpoint_dir=str(tmp_path / "ck"), mesh=make_mesh(n_data=4),
            log_fn=lambda *_: None,
            plot_dir=str(tmp_path / "plots"),
            resident_data=(data, data),
            batch_size=4,
            shuffle_seed=3,
        )
        assert len(history) == 2
        assert np.isfinite(history[-1]["val"]["loss"])
        assert history[-1]["steps"] == 2  # 8 samples / bs 4
        ckpt = CheckpointManager(str(tmp_path / "ck"))
        assert ckpt.has("best")
        import os

        assert os.path.exists(tmp_path / "plots" / "reconstructions.png")

    def test_resident_requires_batch_size(self, dataset):
        model, state = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        data = self._host_split(dataset, self._cond(dataset))
        with pytest.raises(ValueError, match="batch_size"):
            train_vae(
                model, state, None, None, epochs=1,
                mesh=make_mesh(n_data=4), log_fn=lambda *_: None,
                resident_data=(data, data),
            )

    def test_cached_features_driver_matches_live(self, dataset, tmp_path):
        """The resident DFC driver with cache_true_features must track the
        live-feature run epoch for epoch (same seeds/init; the only
        float-level difference is conv tiling at the precompute batch)."""
        unet, ustate = create_unet_state(
            UNET_CFG, TC, jax.random.key(1), grid_d=8
        )
        uvars = {"params": ustate.params, "batch_stats": ustate.batch_stats}
        cond = self._cond(dataset)
        data = self._host_split(dataset, cond)

        def run(cache):
            model, state = create_vae_state(VAE_CFG, TC, jax.random.key(0))
            _, history = train_vae(
                model, state, None, None, epochs=2,
                unet=unet, unet_variables=uvars,
                mesh=make_mesh(n_data=4), log_fn=lambda *_: None,
                resident_data=(data, data), batch_size=4,
                shuffle_seed=3, cache_true_features=cache,
            )
            return history

        live = run(False)
        cached = run(True)
        for hl, hc in zip(live, cached):
            for k in ("loss", "perceptual", "mse", "kld"):
                assert float(hc["train"][k]) == pytest.approx(
                    float(hl["train"][k]), rel=1e-4
                ), k
        assert cached[0]["train"]["perceptual"] > 0


class TestResidentUNet:
    """HBM-resident path for the U-Net trainer (mirrors TestResidentVAE):
    on-device gathers must equal streamed batches, driver runs end-to-end."""

    def _host_split(self, dataset):
        rows = np.arange(len(dataset.ids))
        raw = {
            "density": np.asarray(dataset.arrays["density"][rows]),
            "lattice": np.asarray(dataset.arrays["lattice"][rows]),
            "species": np.minimum(
                np.asarray(dataset.arrays["species"][rows]),
                UNET_CFG.num_classes - 1,
            ),
        }
        return prepare_unet_batch(
            raw, UNET_CFG.num_classes, device_coords=True,
            ship_dtype="float32",
        )

    def test_eval_matches_streaming(self, dataset):
        from jax.sharding import NamedSharding, PartitionSpec

        from icsg3d_tpu.parallel import batch_sharding

        model, state = create_unet_state(
            UNET_CFG, TC, jax.random.key(0), grid_d=8
        )
        _, eval_stream = make_unet_steps(model)
        _, eval_res = make_unet_steps(model, resident=True)
        data = self._host_split(dataset)
        mesh = make_mesh(n_data=4)
        data_dev = jax.device_put(data, NamedSharding(mesh, PartitionSpec()))
        rows = np.array([0, 2, 5, 7], dtype=np.int32)
        batch = {k: v[rows] for k, v in data.items()}
        m_stream = eval_stream(state, shard_batch(batch, mesh))
        idx = jax.device_put(rows, batch_sharding(mesh))
        m_res = eval_res(state, data_dev, idx)
        for k in m_stream:
            np.testing.assert_allclose(
                np.asarray(m_res[k]), np.asarray(m_stream[k]),
                rtol=1e-5, atol=1e-7, err_msg=k,
            )

    def test_resident_driver(self, dataset, tmp_path):
        model, state = create_unet_state(
            UNET_CFG, TC, jax.random.key(0), grid_d=8
        )
        data = self._host_split(dataset)
        state, history = train_unet(
            model, state, None, None, epochs=2,
            checkpoint_dir=str(tmp_path / "ck"), mesh=make_mesh(n_data=4),
            log_fn=lambda *_: None,
            plot_dir=str(tmp_path / "plots"),
            resident_data=(data, data),
            batch_size=4,
            shuffle_seed=5,
        )
        assert len(history) == 2
        assert np.isfinite(history[-1]["val"]["loss"])
        ckpt = CheckpointManager(str(tmp_path / "ck"))
        assert ckpt.has("best")
        import os

        assert os.path.exists(tmp_path / "plots" / "segmentations_best.png")

    def test_resident_requires_batch_size(self, dataset):
        model, state = create_unet_state(
            UNET_CFG, TC, jax.random.key(0), grid_d=8
        )
        data = self._host_split(dataset)
        with pytest.raises(ValueError, match="batch_size"):
            train_unet(
                model, state, None, None, epochs=1,
                mesh=make_mesh(n_data=4), log_fn=lambda *_: None,
                resident_data=(data, data),
            )


class TestCachedFeatures:
    """cache_true_features: pre-gathered frozen-net taps must reproduce
    the live DFC loss exactly, and the whole-split precompute must match
    per-sample direct forwards (including the pad-to-batch tail)."""

    def _setup(self, dataset):
        model, state = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        unet, ustate = create_unet_state(
            UNET_CFG, TC, jax.random.key(1), grid_d=8
        )
        uvars = {"params": ustate.params, "batch_stats": ustate.batch_stats}
        _, cond, _ = bin_and_encode(
            np.asarray(dataset.arrays["target"]), VAE_CFG.cond_bins
        )
        it = BatchIterator(
            dataset, dataset.ids, 4, fields=("density", "coords"),
            extra={"cond": cond},
        )
        batch = prepare_vae_batch(next(iter(it)), next(iter(it))["cond"])
        return model, state, unet, uvars, batch

    def test_cached_loss_matches_live(self, dataset):
        from icsg3d_tpu.train.vae import (
            _assemble_x, _perceptual_features, _vae_losses,
        )

        model, state, unet, uvars, batch = self._setup(dataset)
        rng = jax.random.key(7)
        live, (live_mets, _) = _vae_losses(
            model, unet, uvars, state.params, state.batch_stats,
            batch, rng, train=False,
        )
        x = _assemble_x(dict(batch), model.cfg.grid)
        feats = _perceptual_features(
            unet, uvars, x, model.cfg.perceptual_taps
        )
        cached_batch = dict(batch)
        for tap, f in zip(model.cfg.perceptual_taps, feats):
            cached_batch[f"pfeat_{tap}"] = f
        cached, (cached_mets, _) = _vae_losses(
            model, unet, uvars, state.params, state.batch_stats,
            cached_batch, rng, train=False,
        )
        assert float(live) == float(cached)
        assert float(live_mets["perceptual"]) == float(
            cached_mets["perceptual"]
        )
        assert float(live_mets["perceptual"]) > 0

    def test_precompute_matches_direct(self, dataset):
        from icsg3d_tpu.train.vae import (
            _assemble_x, _perceptual_features, precompute_true_features,
            true_feature_cache_bytes,
        )

        model, state, unet, uvars, _ = self._setup(dataset)
        rows = np.arange(len(dataset.ids))
        data = {
            "density": jnp.asarray(
                np.asarray(dataset.arrays["density"][rows], np.float32)
            ),
            "abc": jnp.asarray(
                np.asarray(dataset.arrays["lattice"][rows, :3], np.float32)
            ),
        }
        n = len(rows)
        cache = precompute_true_features(
            model, unet, uvars, data, batch_size=3  # n=8 -> pad tail
        )
        x = _assemble_x(dict(data), model.cfg.grid)
        direct = _perceptual_features(
            unet, uvars, x, model.cfg.perceptual_taps
        )
        for tap, f in zip(model.cfg.perceptual_taps, direct):
            got = cache[f"pfeat_{tap}"]
            assert got.shape == f.shape
            # batch-shape-dependent conv reduction order: the cache is
            # computed at batch_size rows, the oracle at n rows
            assert np.allclose(
                np.asarray(got), np.asarray(f), atol=5e-6, rtol=2e-5
            )
        est = true_feature_cache_bytes(model, unet, uvars, n)
        assert est == sum(int(v.nbytes) for v in cache.values())


class TestCGCNNTraining:
    def test_loss_decreases(self, rng):
        cfg = CGCNNConfig(max_atoms=8, max_neighbors=4)
        model, state = create_cgcnn_state(cfg, TC, jax.random.key(0))
        train_step, eval_step = make_cgcnn_steps(model)
        mesh = make_mesh(n_data=4)
        B = 8
        batch = {
            "atom_fea": rng.random((B, 8, 93)).astype(np.float32),
            "nbr_dist": rng.uniform(1, 6, (B, 8, 4)).astype(np.float32),
            "nbr_idx": rng.integers(0, 8, (B, 8, 4)).astype(np.int32),
            "atom_mask": np.ones((B, 8), np.float32),
            "target": rng.normal(size=(B,)).astype(np.float32),
        }
        sb = shard_batch(batch, mesh)
        first = None
        for _ in range(20):
            state, mets = train_step(state, sb)
            if first is None:
                first = float(mets["loss"])
        assert float(mets["loss"]) < first
        em = eval_step(state, sb)
        assert np.isfinite(float(em["mae"]))


class TestPlottingHooks:
    def test_vae_best_val_plots_written(self, dataset, tmp_path):
        from icsg3d_tpu.data.binning import bin_and_encode
        from icsg3d_tpu.train import create_vae_state, train_vae
        from icsg3d_tpu.train.vae import prepare_vae_batch

        model, state = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        _, cond, _ = bin_and_encode(
            np.asarray(dataset.arrays["target"]), VAE_CFG.cond_bins
        )

        def gen():
            from icsg3d_tpu.data import BatchIterator

            it = BatchIterator(
                dataset, dataset.ids, 4, fields=("density", "coords"),
                extra={"cond": cond},
            )
            for b in it:
                yield prepare_vae_batch(b, b["cond"])

        import os

        train_vae(
            model, state, gen, gen, epochs=1,
            checkpoint_dir=str(tmp_path / "ck"),
            plot_dir=str(tmp_path / "plots"),
            mesh=make_mesh(n_data=4), log_fn=lambda *_: None,
        )
        assert os.path.exists(tmp_path / "plots" / "reconstructions.png")
        assert os.path.exists(tmp_path / "plots" / "samples.png")
        assert os.path.exists(tmp_path / "plots" / "latent_kde.png")

    def test_unet_best_val_plots_written(self, dataset, tmp_path):
        import os

        from icsg3d_tpu.train import create_unet_state, train_unet

        model, state = create_unet_state(UNET_CFG, TC, jax.random.key(0), grid_d=8)
        gen = unet_batches(dataset, UNET_CFG.num_classes)
        train_unet(
            model, state, gen, gen, epochs=1,
            checkpoint_dir=str(tmp_path / "ck"),
            plot_dir=str(tmp_path / "plots"),
            mesh=make_mesh(n_data=4), log_fn=lambda *_: None,
        )
        assert os.path.exists(tmp_path / "plots" / "segmentations_best.png")


class TestSamplePrior:
    def test_sample_prior_shapes(self):
        from icsg3d_tpu.models.vae import sample_prior

        model, state = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        z, out = sample_prior(model, variables, jax.random.key(1), n_samples=3, var=0.5)
        assert np.asarray(z).shape == (3, VAE_CFG.latent_dim)
        assert np.asarray(out).shape == (3, 8, 8, 8, 4)
        assert np.isfinite(np.asarray(out)).all()


class TestDeviceCoords:
    """Shipping density+abc and rebuilding coordinate channels on device must
    produce identical losses to shipping the full 4-channel grids (valid for
    non-rotated samples)."""

    def test_vae_losses_match(self, dataset):
        from icsg3d_tpu.train.vae import make_vae_steps, prepare_vae_batch
        from icsg3d_tpu.data.binning import bin_and_encode
        from icsg3d_tpu.train import create_vae_state

        model, state = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        _, eval_step = make_vae_steps(model)
        _, cond, _ = bin_and_encode(
            np.asarray(dataset.arrays["target"]), VAE_CFG.cond_bins
        )
        ids = [i for i in dataset.ids if "_rot_" not in i][:4]
        it = BatchIterator(
            dataset, ids, 4, fields=("density", "coords", "lattice"),
            extra={"cond": cond[dataset.rows(ids)]},
        )
        raw = next(iter(it))
        mesh = make_mesh(n_data=4)
        key = jax.random.key(3)
        m_host = eval_step(
            state, shard_batch(prepare_vae_batch(raw, raw["cond"]), mesh), key
        )
        m_dev = eval_step(
            state,
            shard_batch(
                prepare_vae_batch(raw, raw["cond"], device_coords=True), mesh
            ),
            key,
        )
        assert float(m_host["loss"]) == pytest.approx(
            float(m_dev["loss"]), rel=1e-5
        )

    def test_unet_losses_match(self, dataset):
        from icsg3d_tpu.train.unet import make_unet_steps, prepare_unet_batch
        from icsg3d_tpu.train import create_unet_state

        model, state = create_unet_state(UNET_CFG, TC, jax.random.key(0), grid_d=8)
        _, eval_step = make_unet_steps(model)
        ids = [i for i in dataset.ids if "_rot_" not in i][:4]
        it = BatchIterator(
            dataset, ids, 4, fields=("density", "coords", "lattice", "species")
        )
        raw = next(iter(it))
        mesh = make_mesh(n_data=4)
        m_host = eval_step(
            state, shard_batch(prepare_unet_batch(raw, UNET_CFG.num_classes), mesh)
        )
        m_dev = eval_step(
            state,
            shard_batch(
                prepare_unet_batch(
                    raw, UNET_CFG.num_classes, device_coords=True
                ),
                mesh,
            ),
        )
        assert float(m_host["loss"]) == pytest.approx(
            float(m_dev["loss"]), rel=1e-5
        )


class TestSaveEpoch:
    """save_epoch: one fetch per epoch, thinned `latest` cadence."""

    def _state(self, tmp_path):
        model, state = create_unet_state(
            UNET_CFG, TC, jax.random.key(0), grid_d=8
        )
        return state

    def test_latest_thinning_and_best(self, tmp_path):
        import os

        state = self._state(tmp_path)
        ckpt = CheckpointManager(str(tmp_path / "ck"))
        latest = str(tmp_path / "ck" / "latest")

        # epoch 0: metric improves, cadence (3) not due -> best only
        assert ckpt.save_epoch(state, 5.0, epoch=0, latest_every=3)
        assert ckpt.has("best") and not os.path.exists(latest)

        # epoch 1: worse metric, cadence not due -> nothing written
        import shutil

        assert not ckpt.save_epoch(state, 9.0, epoch=1, latest_every=3)
        assert not os.path.exists(latest)

        # epoch 2: worse metric but cadence due ((2+1) % 3 == 0) -> latest only
        assert not ckpt.save_epoch(state, 9.0, epoch=2, latest_every=3)
        assert os.path.exists(latest)
        assert ckpt.best_metric == 5.0

        # improvement off-cadence writes best ONLY (the cheap
        # inference-slice fetch); latest waits for its cadence or the
        # driver loop tail's guarded save_latest()
        shutil.rmtree(latest)
        assert ckpt.save_epoch(state, 1.0, epoch=3, latest_every=100)
        assert not os.path.exists(latest)
        assert ckpt.best_metric == 1.0

    def test_best_is_inference_slice(self, tmp_path):
        """best holds no optimizer state; latest holds the full state;
        a legacy full-state `best` dir still restores."""
        import numpy as np

        state = self._state(tmp_path)
        # make the live state distinguishable from a fresh template
        state = state.replace(step=state.step + 7)
        ckpt = CheckpointManager(str(tmp_path / "ck"))
        assert ckpt.save_epoch(state, 5.0, epoch=0, latest_every=1)

        fresh = self._state(tmp_path)
        r_best = ckpt.restore(fresh, "best")
        assert int(r_best.step) == int(state.step)
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(r_best.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        )
        # opt_state stayed the template's (best carries none); latest
        # restores the full optimizer state
        r_latest = ckpt.restore(fresh, "latest")
        for a, b in zip(
            jax.tree_util.tree_leaves(r_latest.opt_state),
            jax.tree_util.tree_leaves(state.opt_state),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # legacy layout: a full-state tree saved AS `best` (pre-split
        # checkpoints) restores through the fallback arm
        legacy = CheckpointManager(str(tmp_path / "ck2"))
        legacy._save_swap("best", jax.device_get(legacy._tree(state)))
        r_legacy = legacy.restore(self._state(tmp_path), "best")
        assert int(r_legacy.step) == int(state.step)


class TestCheckpointCrashSafety:
    """NaN metrics must never wedge best-saving; interrupted swap saves
    must heal; a truncated best_metric.json must not block resume."""

    def _state(self):
        _, state = create_unet_state(UNET_CFG, TC, jax.random.key(0), grid_d=8)
        return state

    def test_nan_metric_never_best(self, tmp_path):
        state = self._state()
        ckpt = CheckpointManager(str(tmp_path / "ck"))
        assert not ckpt.save_epoch(state, float("nan"), epoch=0,
                                   latest_every=100)
        assert not ckpt.has("best")
        assert ckpt.save_epoch(state, 2.0, epoch=1, latest_every=100)
        assert ckpt.best_metric == 2.0

    def test_heal_after_interrupted_swap(self, tmp_path):
        import os

        state = self._state()
        ckpt = CheckpointManager(str(tmp_path / "ck"))
        ckpt.save_epoch(state, 1.0, epoch=0)
        latest = str(tmp_path / "ck" / "latest")
        # simulate a kill between the two renames: checkpoint displaced
        os.rename(latest, latest + ".new")
        ckpt2 = CheckpointManager(str(tmp_path / "ck"))
        assert ckpt2.has("latest")           # healed from .new
        restored = ckpt2.restore(self._state(), "latest")
        assert int(restored.step) == int(state.step)

    def test_truncated_metric_json_tolerated(self, tmp_path):
        state = self._state()
        ckpt = CheckpointManager(str(tmp_path / "ck"))
        ckpt.save_epoch(state, 1.0, epoch=0)
        with open(tmp_path / "ck" / "best_metric.json", "w") as f:
            f.write('{"metr')  # kill mid-write
        ckpt2 = CheckpointManager(str(tmp_path / "ck"))
        assert ckpt2.best_metric is None  # degrades, does not crash

    def test_mode_mismatch_rejected(self, tmp_path):
        state = self._state()
        ckpt = CheckpointManager(str(tmp_path / "ck"))
        ckpt.save_epoch(state, 1.0, epoch=0)
        with pytest.raises(ValueError, match="mode"):
            CheckpointManager(str(tmp_path / "ck"), mode="max")


class TestShipDtype:
    """float16 density shipping: coords stay float32, loss within fp16 noise."""

    def test_vae_fp16_close_and_coords_f32(self, dataset):
        from icsg3d_tpu.data.binning import bin_and_encode
        from icsg3d_tpu.train import create_vae_state
        from icsg3d_tpu.train.vae import make_vae_steps, prepare_vae_batch

        model, state = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        _, eval_step = make_vae_steps(model)
        _, cond, _ = bin_and_encode(
            np.asarray(dataset.arrays["target"]), VAE_CFG.cond_bins
        )
        it = BatchIterator(
            dataset, dataset.ids[:4], 4, fields=("density", "coords", "lattice"),
            extra={"cond": cond[dataset.rows(dataset.ids[:4])]},
        )
        raw = next(iter(it))
        mesh = make_mesh(n_data=4)
        key = jax.random.key(3)
        b32 = prepare_vae_batch(raw, raw["cond"], ship_dtype="float32")
        b16 = prepare_vae_batch(raw, raw["cond"], ship_dtype="float16")
        assert b16["density"].dtype == np.float16
        assert b16["coords"].dtype == np.float32  # regression target stays f32
        m32 = eval_step(state, shard_batch(b32, mesh), key)
        m16 = eval_step(state, shard_batch(b16, mesh), key)
        assert float(m16["loss"]) == pytest.approx(float(m32["loss"]), rel=2e-3)


class TestAbstractState:
    """Abstract (host-zeros) state skeletons match the concrete init's
    structure, so checkpoint restore works without a device init."""

    def test_structure_and_shapes_match(self):
        model, concrete = create_unet_state(
            UNET_CFG, TC, jax.random.key(0), grid_d=8
        )
        _, skeleton = create_unet_state(
            UNET_CFG, TC, jax.random.key(0), grid_d=8, abstract=True
        )
        ct = jax.tree_util.tree_structure(
            (concrete.params, concrete.batch_stats, concrete.opt_state)
        )
        st = jax.tree_util.tree_structure(
            (skeleton.params, skeleton.batch_stats, skeleton.opt_state)
        )
        assert ct == st
        for c, s in zip(
            jax.tree_util.tree_leaves(
                (concrete.params, concrete.batch_stats, concrete.opt_state)
            ),
            jax.tree_util.tree_leaves(
                (skeleton.params, skeleton.batch_stats, skeleton.opt_state)
            ),
        ):
            assert np.shape(c) == np.shape(s)
            assert np.asarray(c).dtype == np.asarray(s).dtype
            assert isinstance(s, np.ndarray)  # host-only

    def test_restore_into_abstract_matches(self, tmp_path):
        model, state = create_unet_state(
            UNET_CFG, TC, jax.random.key(7), grid_d=8
        )
        ckpt = CheckpointManager(str(tmp_path / "ck"))
        ckpt.save_latest(state)
        _, skeleton = create_unet_state(
            UNET_CFG, TC, jax.random.key(0), grid_d=8, abstract=True
        )
        restored = CheckpointManager(str(tmp_path / "ck")).restore(
            skeleton, "latest"
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEpochScan:
    """--epoch-scan: the whole-epoch lax.scan resident program
    (train/vae.py make_vae_epoch_fns) must reproduce the per-step
    resident path — identical batch order (host permutation contract)
    and identical rng-draw structure (carried key, one split per
    step/val batch) — so the two paths give the same optimizer
    trajectory and can be swapped across --resume chunks."""

    def _split(self, dataset):
        _, cond, _ = bin_and_encode(
            np.asarray(dataset.arrays["target"]), VAE_CFG.cond_bins
        )
        rows = np.arange(len(dataset.ids))
        return {
            "density": np.asarray(
                dataset.arrays["density"][rows], dtype=np.float32
            ),
            "abc": np.asarray(
                dataset.arrays["lattice"][rows, :3], dtype=np.float32
            ),
            "cond": cond[rows].astype(np.float32),
        }

    def test_matches_per_step_path(self, dataset):
        data = self._split(dataset)
        kw = dict(
            epochs=2, mesh=make_mesh(n_data=4), log_fn=lambda *_: None,
            resident_data=(data, data), batch_size=4, shuffle_seed=3,
            seed=5,
        )
        model, s1 = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        _, s2 = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        s1, h1 = train_vae(model, s1, None, None, **kw)
        s2, h2 = train_vae(model, s2, None, None, epoch_scan=True, **kw)
        for a, b in zip(h1, h2):
            assert a["steps"] == b["steps"] == 2  # 8 samples / bs 4
            for k in ("loss", "mse", "kld"):
                assert a["train"][k] == pytest.approx(
                    b["train"][k], rel=2e-5
                ), k
            # val runs BN in inference mode (running stats), where the
            # noise-walked conv biases below cancel only approximately —
            # train mode subtracts the batch mean exactly, hence the
            # looser val bar
            assert a["val"]["loss"] == pytest.approx(
                b["val"]["loss"], rel=5e-4
            )
        # atol: conv biases immediately followed by BatchNorm have a
        # mathematically-zero gradient (BN subtracts the mean), so their
        # Adam updates are sign-of-float-noise random walks of ~lr per
        # step and legitimately differ between the two compiled
        # programs; every informative leaf agrees far tighter (the loss
        # trajectory above matches to ~1e-7 relative)
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-3, atol=5e-3
            ),
            s1.params, s2.params,
        )

    def test_composes_with_dfc_and_feature_cache(self, dataset):
        data = self._split(dataset)
        model, state = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        unet, ustate = create_unet_state(
            UNET_CFG, TC, jax.random.key(1), grid_d=8
        )
        uvars = {
            "params": ustate.params, "batch_stats": ustate.batch_stats
        }
        state, hist = train_vae(
            model, state, None, None, epochs=1,
            unet=unet, unet_variables=uvars,
            mesh=make_mesh(n_data=4), log_fn=lambda *_: None,
            resident_data=(data, data), batch_size=4,
            cache_true_features=True, epoch_scan=True,
        )
        assert np.isfinite(hist[-1]["val"]["loss"])
        assert hist[-1]["train"]["perceptual"] > 0

    def test_requires_resident(self, dataset):
        model, state = create_vae_state(VAE_CFG, TC, jax.random.key(0))
        with pytest.raises(ValueError, match="resident"):
            train_vae(
                model, state, None, None, epochs=1,
                mesh=make_mesh(n_data=4), log_fn=lambda *_: None,
                epoch_scan=True,
            )


class TestUNetEpochScan:
    """U-Net mirror of TestEpochScan: the whole-epoch lax.scan resident
    program must match the per-step resident path (same batch order; no
    rng in the U-Net step), with per-class CE vectors surviving the
    step-axis-only metric reduction."""

    def _split(self, dataset):
        rows = np.arange(len(dataset.ids))
        raw = {
            "density": np.asarray(dataset.arrays["density"][rows]),
            "lattice": np.asarray(dataset.arrays["lattice"][rows]),
            "species": np.minimum(
                np.asarray(dataset.arrays["species"][rows]),
                UNET_CFG.num_classes - 1,
            ),
        }
        return prepare_unet_batch(
            raw, UNET_CFG.num_classes, device_coords=True,
            ship_dtype="float32",
        )

    def test_matches_per_step_path(self, dataset):
        data = self._split(dataset)
        # the PRODUCTION U-Net lr (train_unet.py:53-61): at the test
        # class's aggressive 1e-3, Adam amplifies compile-order float
        # noise into sign-flipped ~lr update walks within two steps
        # (measured: epoch-0 mean loss matches to 2e-6 rel, epoch 1
        # drifts 1e-3); at 3e-6 the trajectories stay tight and the
        # equivalence contract is meaningful
        tc = TrainConfig(batch_size=4, learning_rate=3e-6)
        kw = dict(
            epochs=2, mesh=make_mesh(n_data=4), log_fn=lambda *_: None,
            resident_data=(data, data), batch_size=4, shuffle_seed=5,
        )
        model, s1 = create_unet_state(
            UNET_CFG, tc, jax.random.key(0), grid_d=8
        )
        _, s2 = create_unet_state(
            UNET_CFG, tc, jax.random.key(0), grid_d=8
        )
        s1, h1 = train_unet(model, s1, None, None, **kw)
        s2, h2 = train_unet(model, s2, None, None, epoch_scan=True, **kw)
        for a, b in zip(h1, h2):
            for k in ("loss", "ce", "f1"):
                assert a["train"][k] == pytest.approx(
                    b["train"][k], rel=1e-4
                ), k
            assert a["val"]["loss"] == pytest.approx(
                b["val"]["loss"], rel=1e-4
            )
            np.testing.assert_allclose(
                a["val"]["ce_per_class"], b["val"]["ce_per_class"],
                rtol=1e-3, atol=1e-5,
            )
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-4
            ),
            s1.params, s2.params,
        )

    def test_requires_resident(self, dataset):
        model, state = create_unet_state(
            UNET_CFG, TC, jax.random.key(0), grid_d=8
        )
        with pytest.raises(ValueError, match="resident"):
            train_unet(
                model, state, None, None, epochs=1,
                mesh=make_mesh(n_data=4), log_fn=lambda *_: None,
                epoch_scan=True,
            )
