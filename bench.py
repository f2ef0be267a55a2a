"""Benchmark: conditional DFC-VAE training throughput at 32^3 on real TPU.

Prints ONE JSON line:
    {"metric": "vae_grids_per_sec_per_chip", "value": N, "unit": "grids/s/chip",
     "vs_baseline": R, "extra": {...}}

The primary metric is voxel grids per second per chip through the FULL
DFC training step (VAE forward + two frozen U-Net perceptual forwards +
backward + Adam update) at the reference's production geometry
(32^3 x 4 grids, latent 256, 95-class perceptual U-Net — vae/lattice_vae.py
defaults).  The reference repo publishes no numbers (BASELINE.md), so
``vs_baseline`` is measured against the driver's north-star rate: training
10k grids x 250 epochs in 10 minutes on 8 chips = 521 grids/s/chip
(BASELINE.json north_star).  vs_baseline >= 1.0 means the north star is met.

Architecture (round 5): every section runs in its OWN subprocess
(``python bench.py --section NAME``) so that
  * a section that dies (OOM, compile failure) cannot poison later
    sections — round 4 lost 4 of 7 metrics to exactly that cascade
    (a failed 64^3 section left its state resident and every later
    section hit RESOURCE_EXHAUSTED);
  * all HBM/host memory is released by process exit, not by ``del``;
  * each failed section is retried once after a cool-down, which rides
    out transient chip contention.
Before starting, the orchestrator waits (bounded) for any live training
campaign on this machine to finish — either a ``.chip_busy.pid``
sentinel written by ``tools/campaign_*.sh`` or any visible
``icsg3d_tpu.apps.train_*`` / ``tools/campaign`` process — because a
resident trainer can hold ~12 GB of the chip's 15.75 GB HBM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

NORTH_STAR_GRIDS_PER_SEC_PER_CHIP = 10_000 * 250 / 600 / 8  # 520.8

BUSY_SENTINEL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".chip_busy.pid")

# ---------------------------------------------------------------------------
# orchestrator helpers (host-only; no jax import in the parent process)
# ---------------------------------------------------------------------------


def _other_chip_users():
    """Pids of OTHER processes that look like they hold (or will hold)
    the tunneled chip: campaign trainers/apps and campaign shells.

    Read-only /proc scan — never used to signal anything.
    """
    me = os.getpid()
    needles = (
        "icsg3d_tpu.apps.train", "icsg3d_tpu.apps.generate",
        "icsg3d_tpu.apps.evaluate", "icsg3d_tpu.apps.voxelize",
        "tools/campaign",
    )
    users = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        if any(n in cmd for n in needles) and "bench.py" not in cmd:
            users.append((int(pid), cmd.strip()[:120]))
    return users


def _sentinel_busy():
    try:
        with open(BUSY_SENTINEL) as f:
            pid = int(f.read().split()[0])
        os.kill(pid, 0)  # liveness probe only
        return pid
    except (OSError, ValueError, IndexError):
        return None


def wait_for_chip(max_wait_sec):
    """Poll until no campaign appears to hold the chip, or timeout.

    Proceeds regardless after the timeout (the bench must record
    *something*); logs what it saw to stderr so a degraded record is
    explainable.
    """
    t0 = time.time()
    warned = False
    while time.time() - t0 < max_wait_sec:
        spid = _sentinel_busy()
        users = _other_chip_users()
        if spid is None and not users:
            if warned:
                print(f"bench: chip free after {time.time() - t0:.0f}s wait",
                      file=sys.stderr)
            return True
        if not warned or (time.time() - t0) % 300 < 30:
            what = ([f"sentinel pid {spid}"] if spid else []) + [
                f"pid {p}: {c}" for p, c in users[:3]]
            print(f"bench: chip busy ({'; '.join(what)}); waiting...",
                  file=sys.stderr)
            warned = True
        time.sleep(30)
    print(f"bench: chip still busy after {max_wait_sec}s; proceeding anyway",
          file=sys.stderr)
    return False


def run_section(name, timeout_sec, retries=1, retry_delay=None):
    """Run one bench section in a subprocess; return its parsed JSON dict
    (last stdout line) or None."""
    if retry_delay is None:
        retry_delay = int(os.environ.get("BENCH_RETRY_DELAY", "120"))
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
    for attempt in range(retries + 1):
        if attempt:
            print(f"bench: retrying section {name} in {retry_delay}s "
                  f"(attempt {attempt + 1})", file=sys.stderr)
            time.sleep(retry_delay)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--section", name],
                capture_output=True, text=True, timeout=timeout_sec, env=env,
            )
        except subprocess.TimeoutExpired:
            print(f"bench: section {name} timed out after {timeout_sec}s",
                  file=sys.stderr)
            continue
        if proc.returncode == 0:
            for line in reversed(proc.stdout.strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        return json.loads(line)
                    except json.JSONDecodeError:
                        break
            print(f"bench: section {name} produced no JSON line",
                  file=sys.stderr)
        else:
            tail = "\n".join(proc.stderr.strip().splitlines()[-4:])
            print(f"bench: section {name} failed rc={proc.returncode}:\n{tail}",
                  file=sys.stderr)
    return None


def orchestrate():
    wait_for_chip(int(os.environ.get("BENCH_BUSY_WAIT_SEC", "1800")))

    to = int(os.environ.get("BENCH_SECTION_TIMEOUT", "1500"))
    # vae32 is the headline: give it an extra retry.
    vae32 = run_section("vae32", to, retries=2)
    vae64 = (run_section("vae64", to)
             if os.environ.get("BENCH_SKIP_64") != "1" else None)
    gen = (run_section("generate", to)
           if os.environ.get("BENCH_SKIP_GENERATE") != "1" else None)
    unet = cgcnn = None
    if os.environ.get("BENCH_SKIP_EXTRAS") != "1":
        unet = run_section("unet", to)
        cgcnn = run_section("cgcnn", to)

    vae32 = vae32 or {}
    value = vae32.get("grids_per_sec_per_chip", 0.0)
    out = {
        "metric": "vae_grids_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "grids/s/chip",
        "vs_baseline": round(value / NORTH_STAR_GRIDS_PER_SEC_PER_CHIP, 4),
        "extra": {
            "batch_size": vae32.get("batch_size", 128),
            "grid": 32,
            "n_chips": vae32.get("n_chips"),
            "step_ms": vae32.get("step_ms"),
            "mfu": vae32.get("mfu"),
            "flops_per_step": vae32.get("flops_per_step"),
            "gen_samples_per_sec_per_chip": (gen or {}).get(
                "samples_per_sec_per_chip"),
            "cached_feats_grids_per_sec_per_chip": vae32.get(
                "cached_grids_per_sec_per_chip"),
            "vae64_grids_per_sec_per_chip": (vae64 or {}).get(
                "grids_per_sec_per_chip"),
            "vae64_mfu": (vae64 or {}).get("mfu"),
            "unet_train_grids_per_sec_per_chip": (unet or {}).get(
                "grids_per_sec_per_chip"),
            "cgcnn_train_graphs_per_sec_per_chip": (cgcnn or {}).get(
                "graphs_per_sec_per_chip"),
            "untrained_random_data_loss": vae32.get("loss"),
            "platform": vae32.get("platform"),
        },
    }
    print(json.dumps(out))


# ---------------------------------------------------------------------------
# sections (each runs in its own fresh subprocess)
# ---------------------------------------------------------------------------


def _setup_jax():
    import jax

    # the axon boot hook pins the platform; the env var alone is ignored,
    # only an early jax.config.update reaches CPU (CLAUDE.md)
    if os.environ.get("BENCH_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"
    )
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    return jax


def _peak_flops():
    from icsg3d_tpu.utils.profiling import PEAK_FLOPS

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    return PEAK_FLOPS.get(gen, PEAK_FLOPS["v5e"])


def _time_steps(step, state, batch, key, n_steps):
    """Chained steps with a host-fetch barrier (a device_get always waits
    for execution over the tunneled device, unlike block_until_ready —
    utils/profiling.py docstring)."""
    import jax

    for _ in range(3):
        state, mets = step(state, batch, key) if key is not None else step(
            state, batch)
    jax.device_get(mets["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, mets = step(state, batch, key) if key is not None else step(
            state, batch)
    jax.device_get(mets["loss"])
    return time.perf_counter() - t0, mets


def _vae_setup(d, batch_size):
    import jax
    import numpy as np

    from icsg3d_tpu.config import GridSpec, TrainConfig, UNetConfig, VAEConfig
    from icsg3d_tpu.parallel import make_mesh, shard_batch
    from icsg3d_tpu.train.unet import create_unet_state
    from icsg3d_tpu.train.vae import create_vae_state, make_vae_steps

    grid = GridSpec(d=d)
    vae_cfg = VAEConfig(grid=grid)
    unet_cfg = UNetConfig()
    tc = TrainConfig(batch_size=batch_size, learning_rate=5e-4)
    vae, state = create_vae_state(vae_cfg, tc, jax.random.key(0))
    unet, ustate = create_unet_state(unet_cfg, tc, jax.random.key(1), grid_d=d)
    train_step, _ = make_vae_steps(
        vae, unet, {"params": ustate.params, "batch_stats": ustate.batch_stats}
    )
    rng = np.random.default_rng(0)
    mesh = make_mesh()
    batch = shard_batch(
        {
            "x": rng.random((batch_size, d, d, d, 4)).astype(np.float32),
            "cond": np.eye(10, dtype=np.float32)[
                rng.integers(0, 10, batch_size)
            ],
        },
        mesh,
    )
    return vae, state, unet, ustate, train_step, batch, mesh, vae_cfg


def section_vae32():
    """Headline: full DFC step at 32^3 (+ the cached-feature production
    variant, reference semantics per vae/lattice_vae.py:241-255)."""
    jax = _setup_jax()

    batch_size, d = 128, 32
    (vae, state, unet, ustate, train_step, batch, mesh,
     vae_cfg) = _vae_setup(d, batch_size)
    key = jax.random.key(0)

    try:
        cost = train_step.lower(state, batch, key).compile().cost_analysis()
        flops_per_step = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        flops_per_step = 0.0

    # the timing loop DONATES the state it is fed; copy now for the
    # cached-feature sub-section below (copying after would read deleted
    # buffers)
    cstate = (
        jax.tree_util.tree_map(lambda a: a.copy(), state)
        if os.environ.get("BENCH_SKIP_CACHED") != "1" else None
    )

    n_steps = 20
    dt, mets = _time_steps(train_step, state, batch, key, n_steps)
    n_chips = len(jax.devices())
    steps_per_sec = n_steps / dt
    rate = steps_per_sec * batch_size / n_chips
    # cost_analysis() reports the compiled (per-device, under GSPMD)
    # module's FLOPs, so per-chip MFU divides by ONE chip's peak
    mfu = (flops_per_step * steps_per_sec / _peak_flops()
           if flops_per_step else None)
    loss = float(jax.device_get(mets["loss"]))

    # Cached-feature production step (--cache-true-features: the frozen
    # U-Net's true-grid taps are precomputed, dropping one of the two
    # perceptual forwards; identical loss).
    cached_rate = None
    if os.environ.get("BENCH_SKIP_CACHED") != "1":
        try:
            from jax.sharding import NamedSharding, PartitionSpec

            from icsg3d_tpu.train.vae import _perceptual_features

            uvars = {"params": ustate.params,
                     "batch_stats": ustate.batch_stats}
            feats = jax.jit(
                lambda xx: _perceptual_features(
                    unet, uvars, xx, vae_cfg.perceptual_taps
                )
            )(batch["x"])
            shard = NamedSharding(mesh, PartitionSpec("data"))
            cbatch = dict(batch)
            for tap, f in zip(vae_cfg.perceptual_taps, feats):
                cbatch[f"pfeat_{tap}"] = jax.device_put(f, shard)
            cdt, _ = _time_steps(train_step, cstate, cbatch, key, n_steps)
            cached_rate = n_steps * batch_size / cdt / n_chips
        except Exception as e:
            print(f"bench: cached-feature sub-section failed: {e!r}",
                  file=sys.stderr)

    print(json.dumps({
        "grids_per_sec_per_chip": round(rate, 2),
        "cached_grids_per_sec_per_chip": (
            round(cached_rate, 2) if cached_rate else None),
        "batch_size": batch_size,
        "n_chips": n_chips,
        "step_ms": round(1000 * dt / n_steps, 2),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "flops_per_step": flops_per_step,
        # loss of a fresh-init model on random synthetic grids — a
        # throughput-run sanity value, NOT a trained-model loss
        "loss": loss,
        "platform": jax.devices()[0].platform,
    }))


def section_vae64():
    """64^3 DFC step (BASELINE config 5) at the measured ndhwc operating
    point bs=48 (COVERAGE.md '64^3 measured ceiling')."""
    jax = _setup_jax()

    bs, d = 48, 64
    _, state, _, _, step, batch, _, _ = _vae_setup(d, bs)
    key = jax.random.key(0)
    try:
        cost = step.lower(state, batch, key).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        flops = 0.0
    n = 10
    dt, _ = _time_steps(step, state, batch, key, n)
    n_chips = len(jax.devices())
    print(json.dumps({
        "grids_per_sec_per_chip": round(n * bs / dt / n_chips, 2),
        "mfu": round(flops * n / dt / _peak_flops(), 4) if flops else None,
    }))


def section_generate():
    """End-to-end generation: fused decode -> segment -> extract ->
    coordinates, one XLA program (BASELINE 'generated samples/sec')."""
    jax = _setup_jax()
    import numpy as np

    from icsg3d_tpu.apps.generate import fused_generate_fn
    from icsg3d_tpu.config import GridSpec, PipelineConfig
    from icsg3d_tpu.parallel import shard_batch, make_mesh
    from icsg3d_tpu.utils.profiling import generation_rate

    batch_size, d = 128, 32
    vae, state, unet, ustate, _, _, mesh, _ = _vae_setup(d, batch_size)
    pipe = PipelineConfig(grid=GridSpec(d=d))
    gen_step = fused_generate_fn(
        vae, {"params": state.params, "batch_stats": state.batch_stats},
        unet, {"params": ustate.params, "batch_stats": ustate.batch_stats},
        pipe, max_atoms=64,
    )
    rng = np.random.default_rng(0)
    zc = shard_batch(
        {
            "z": rng.normal(size=(batch_size, vae.cfg.latent_dim)).astype(
                np.float32),
            "cond": np.eye(10, dtype=np.float32)[
                rng.integers(0, 10, batch_size)],
        },
        mesh,
    )
    # shared harness: chained iterations + host-fetch barrier (resolves
    # the round-2 two-harness 2.2x discrepancy — see its docstring)
    gr = generation_rate(gen_step, zc["z"], zc["cond"], iters=10)
    print(json.dumps({
        "samples_per_sec_per_chip": round(
            gr["samples_per_sec"] / len(jax.devices()), 2),
    }))


def section_unet():
    """U-Net training throughput (reference train_unet.py workload)."""
    jax = _setup_jax()
    import numpy as np

    from icsg3d_tpu.config import GridSpec, TrainConfig, UNetConfig
    from icsg3d_tpu.parallel import make_mesh, shard_batch
    from icsg3d_tpu.train.unet import create_unet_state, make_unet_steps

    batch_size, d = 128, 32
    tc = TrainConfig(batch_size=batch_size, learning_rate=5e-4)
    unet, ustate = create_unet_state(UNetConfig(), tc, jax.random.key(1),
                                     grid_d=d)
    ustep, _ = make_unet_steps(unet, class_weights=None)
    rng = np.random.default_rng(0)
    mesh = make_mesh()
    ubatch = shard_batch(
        {
            "x": rng.random((batch_size, d, d, d, 4)).astype(np.float32),
            "labels": rng.integers(0, 95, (batch_size, d, d, d)).astype(
                np.int32),
        },
        mesh,
    )
    dt, _ = _time_steps(ustep, ustate, ubatch, None, 10)
    print(json.dumps({
        "grids_per_sec_per_chip": round(
            batch_size * 10 / dt / len(jax.devices()), 2),
    }))


def section_cgcnn():
    """CGCNN training throughput (reference train_cgcnn.py workload)."""
    jax = _setup_jax()
    import numpy as np

    from icsg3d_tpu.config import CGCNNConfig, TrainConfig
    from icsg3d_tpu.parallel import make_mesh, shard_batch
    from icsg3d_tpu.train.cgcnn import create_cgcnn_state, make_cgcnn_steps

    ccfg = CGCNNConfig()
    cbs = 256
    cmodel, cstate = create_cgcnn_state(
        ccfg, TrainConfig(batch_size=cbs, learning_rate=1e-3),
        jax.random.key(2),
    )
    cstep, _ = make_cgcnn_steps(cmodel)
    rng = np.random.default_rng(0)
    mesh = make_mesh()
    cbatch = shard_batch(
        {
            "atom_fea": rng.random(
                (cbs, ccfg.max_atoms, ccfg.atom_input_dim)).astype(np.float32),
            "nbr_dist": rng.uniform(
                1, 8, (cbs, ccfg.max_atoms, ccfg.max_neighbors)).astype(
                np.float32),
            "nbr_idx": rng.integers(
                0, ccfg.max_atoms,
                (cbs, ccfg.max_atoms, ccfg.max_neighbors)).astype(np.int32),
            "atom_mask": np.ones((cbs, ccfg.max_atoms), np.float32),
            "target": rng.normal(size=(cbs,)).astype(np.float32),
        },
        mesh,
    )
    dt, _ = _time_steps(cstep, cstate, cbatch, None, 10)
    print(json.dumps({
        "graphs_per_sec_per_chip": round(
            cbs * 10 / dt / len(jax.devices()), 2),
    }))


SECTIONS = {
    "vae32": section_vae32,
    "vae64": section_vae64,
    "generate": section_generate,
    "unet": section_unet,
    "cgcnn": section_cgcnn,
}


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        SECTIONS[sys.argv[2]]()
    else:
        orchestrate()


if __name__ == "__main__":
    main()
