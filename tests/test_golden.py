"""Golden-value REGRESSION tests: tiny fixed-seed forward passes of each
model family against stored fixtures.

These are refactor armor, NOT reference-parity oracles: the fixtures are
self-generated (tests/golden/*.npz, committed) — a test run with a missing
fixture records the current implementation's outputs and skips; later runs
pin them so refactors that change numerics are caught.  To re-record
intentionally, delete the .npz and rerun.  All float32 on CPU for
determinism.

True Keras-model-level parity with the reference is unobtainable in this
environment (its pretrained weights are absent LFS pointers and its
Keras 2.3/TF 2.1 stack cannot run here).  The real parity surface is
pipeline-level and lives elsewhere: voxelizer math vs a transcribed numpy
oracle (tests/test_voxelize.py), loss/metric definitions and label-form
equivalence (tests/test_models.py), watershed contract (tests/
test_segmentation.py), EMD Hungarian parity (tests/test_apps.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icsg3d_tpu.config import CGCNNConfig, GridSpec, UNetConfig, VAEConfig

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((2, 8, 8, 8, 4)).astype(np.float32)
    cond = np.eye(10, dtype=np.float32)[[2, 7]]
    return x, cond


def _vae_outputs():
    from icsg3d_tpu.train.vae import create_vae_state
    from icsg3d_tpu.config import TrainConfig

    cfg = VAEConfig(
        grid=GridSpec(d=8), filters=(4, 8), latent_dim=8, dtype="float32"
    )
    model, state = create_vae_state(cfg, TrainConfig(), jax.random.key(0))
    x, cond = _inputs()
    recon, z_mean, z_log_var, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), jnp.asarray(cond), jax.random.key(1), train=False,
    )
    return {
        "recon": np.asarray(recon),
        "z_mean": np.asarray(z_mean),
        "z_log_var": np.asarray(z_log_var),
    }


def _unet_outputs():
    from icsg3d_tpu.train.unet import create_unet_state
    from icsg3d_tpu.config import TrainConfig

    cfg = UNetConfig(num_classes=12, dtype="float32")
    model, state = create_unet_state(
        cfg, TrainConfig(), jax.random.key(0), grid_d=8
    )
    x, _ = _inputs()
    soft, sig = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False,
    )
    return {"soft": np.asarray(soft), "sig": np.asarray(sig)}


def _cgcnn_outputs():
    from icsg3d_tpu.train.cgcnn import create_cgcnn_state
    from icsg3d_tpu.config import TrainConfig

    cfg = CGCNNConfig(max_atoms=6, max_neighbors=4)
    model, state = create_cgcnn_state(cfg, TrainConfig(), jax.random.key(0))
    rng = np.random.default_rng(1)
    atom_fea = rng.random((2, 6, 93)).astype(np.float32)
    atom_fea[:, 4:] = 0.0
    nbr_dist = rng.uniform(1, 5, (2, 6, 4)).astype(np.float32)
    nbr_idx = rng.integers(0, 4, (2, 6, 4)).astype(np.int32)
    mask = np.zeros((2, 6), np.float32)
    mask[:, :4] = 1.0
    out = model.apply(
        {"params": state.params},
        jnp.asarray(atom_fea), jnp.asarray(nbr_dist), jnp.asarray(nbr_idx),
        jnp.asarray(mask),
    )
    return {"pred": np.asarray(out)}


def _voxelizer_outputs():
    from icsg3d_tpu.ops.voxelize import pad_sites, voxelize

    rng = np.random.default_rng(2)
    cart = rng.uniform(0.5, 3.5, (3, 3)).astype(np.float32)
    z = np.array([11, 17, 8], np.int32)
    sig = np.array([1.0, 0.8, 0.7], np.float32)
    sites, zz, ss, mask = pad_sites(cart, z, sig, 8)
    M, S = voxelize(
        jnp.asarray(sites), jnp.asarray(zz), jnp.asarray(ss),
        jnp.asarray(mask), jnp.asarray([4.0, 4.0, 4.0], jnp.float32),
        GridSpec(d=8),
    )
    return {"M": np.asarray(M), "S": np.asarray(S).astype(np.int32)}


CASES = {
    "vae": _vae_outputs,
    "unet": _unet_outputs,
    "cgcnn": _cgcnn_outputs,
    "voxelizer": _voxelizer_outputs,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    got = CASES[name]()
    if not os.path.exists(path):  # first run records the oracle
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, **got)
        pytest.skip(f"recorded new golden fixture {path}")
    want = np.load(path)
    assert set(want.files) == set(got)
    for k in got:
        np.testing.assert_allclose(
            got[k], want[k], rtol=1e-4, atol=1e-5,
            err_msg=f"{name}/{k} diverged from the golden fixture — if the "
                    f"numerics change is intentional, delete {path} and "
                    f"rerun to re-record",
        )
