"""Profiling and throughput instrumentation.

The reference's only timing was a per-epoch wall-clock print
(vae/lattice_vae.py:312-313).  Here:

- ``trace``: context manager around jax.profiler for on-TPU traces
  viewable in TensorBoard/XProf;
- ``StepTimer``: running step-time/throughput/MFU meter for train loops;
- ``flops_of_jitted``: XLA cost analysis of a jitted function;
- ``fetch_time`` / ``timing_selftest``: tunnel-robust wall-clock timing.

Timing over the tunneled axon device is treacherous in two ways:

1. *Async dispatch*: independent repeated calls return immediately, so a
   timed loop without a data dependency measures dispatch, not execution.
   Every iteration must consume the previous iteration's output.
2. *Degraded blocking*: in a long-lived process (the plugin leaks host
   state per array) ``jax.block_until_ready`` can start returning before
   execution completes, silently turning chained-loop timings into
   dispatch-only timings.  A host *fetch* (``jax.device_get``) always
   waits.  Calibration (known-FLOPs bf16 4096-matmul chain, fresh
   process): block and fetch agree to <2%, per-matmul 0.86 ms vs the
   0.70 ms v5e roofline.  Mid-session, block was observed to report a
   1.1 TFLOP matmul "done" in 0.07 ms while fetch reported ~5.8 ms
   (the roofline value).

Therefore: time with ``fetch_time`` (chains + fetches), and guard
long-lived measurement sessions with ``timing_selftest``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

# Peak bf16 matmul FLOP/s per chip by generation (for MFU).
PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_of_jitted(jitted_fn, *args, **kwargs) -> float:
    """FLOPs per call from XLA's compiled cost analysis (0.0 if opaque)."""
    try:
        cost = jitted_fn.lower(*args, **kwargs).compile().cost_analysis()
        if cost:
            return float(cost.get("flops", 0.0))
    except Exception:
        pass
    return 0.0


def fetch_time(
    step: Callable,
    x0,
    iters: int = 10,
    probe: Optional[Callable] = None,
    overhead_correct: bool = False,
) -> float:
    """Per-iteration wall-clock of ``x -> step(x)``, tunnel-robustly.

    Chains ``iters`` applications (each consumes the previous output) and
    ends with a host fetch of a scalar probe, which — unlike
    ``block_until_ready`` — always waits for real execution on the axon
    tunnel (see module docstring).  ``step`` should already be jitted and
    warmed up; ``probe`` maps the final output to a fetchable scalar
    (default: the output itself, assumed scalar-fetchable via its first
    element).

    With ``overhead_correct=True`` runs the loop at ``iters`` and
    ``2*iters`` and returns the difference slope, cancelling the fixed
    dispatch+fetch overhead (~1-2 ms over the tunnel).
    """

    def _probe(x):
        if probe is not None:
            return probe(x)
        leaf = jax.tree_util.tree_leaves(x)[0]
        return leaf.ravel()[0]

    def run(k: int) -> float:
        x = x0
        t0 = time.perf_counter()
        for _ in range(k):
            x = step(x)
        jax.device_get(_probe(x))
        return time.perf_counter() - t0

    # warmup (compile + one fetch path)
    run(1)
    t1 = run(iters)
    if not overhead_correct:
        return t1 / iters
    t2 = run(2 * iters)
    return (t2 - t1) / iters


def generation_rate(gen_step, z, cond, iters: int = 10) -> dict:
    """Samples/sec of a fused generation program, tunnel-robustly.

    THE one timing harness for the generation headline — bench.py and
    tools/ndcs_step_bench.py both call it, so their numbers are
    comparable by construction.  (Round 2 shipped two hand-rolled loops
    that disagreed 2.2x on the same program: the tool's warmup ran only
    the gen program, so the chain's eager ops — sum/mul/add — compiled
    through the slow remote helper *inside* the timed region.
    ``fetch_time``'s run(1) warmup executes one full chained iteration,
    warming both the program and the chain before timing starts.)

    Chains z through the previous iteration's output (the async-dispatch
    trap) and ends with a host fetch (the degraded-blocking trap).
    """
    batch = int(z.shape[0])

    def step(zz):
        out = gen_step(zz, cond)
        # any output leaf works: all outputs of one executed XLA program
        # materialize together, so depending on one puts the whole
        # program on the critical path
        leaf = jax.tree_util.tree_leaves(out)[0]
        return zz + 1e-30 * jnp.sum(leaf.astype(jnp.float32))

    dt = fetch_time(step, z, iters=iters)
    return {
        "batch_ms": round(1e3 * dt, 2),
        "samples_per_sec": round(batch / dt, 1),
        "iters": iters,
    }


def timing_selftest(n: int = 2048, k: int = 10) -> dict:
    """Detect degraded ``block_until_ready`` in the current process.

    Runs a chained bf16 matmul with known FLOPs twice — once timed via
    block, once via fetch — and reports both.  ``degraded=True`` means
    block-based timings in this process are dispatch-only and must not
    be trusted (restart the process or use ``fetch_time``).
    """
    mm = jax.jit(lambda x: (x @ x) * (1.0 / n))
    x = jnp.ones((n, n), jnp.bfloat16)
    x = mm(x)
    jax.block_until_ready(x)
    jax.device_get(x[0, 0])

    y = x
    t0 = time.perf_counter()
    for _ in range(k):
        y = mm(y)
    jax.block_until_ready(y)
    t_block = time.perf_counter() - t0

    y = x
    t0 = time.perf_counter()
    for _ in range(k):
        y = mm(y)
    jax.device_get(y[0, 0])
    t_fetch = time.perf_counter() - t0

    return {
        "t_block_ms": t_block * 1e3,
        "t_fetch_ms": t_fetch * 1e3,
        "degraded": t_block < 0.5 * t_fetch,
    }


class StepTimer:
    """Running throughput meter.

    Usage:
        timer = StepTimer(items_per_step=batch_size, flops_per_step=f)
        for batch in data:
            state, m = step(state, batch)
            stats = timer.tick()   # None until warmup steps pass
    """

    def __init__(
        self,
        items_per_step: int,
        flops_per_step: float = 0.0,
        warmup: int = 2,
        peak_flops: Optional[float] = None,
    ):
        self.items_per_step = items_per_step
        self.flops_per_step = flops_per_step
        self.warmup = warmup
        self.n = 0
        self.t0: Optional[float] = None
        if peak_flops is None:
            try:
                import os

                gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
                peak_flops = PEAK_FLOPS.get(gen, PEAK_FLOPS["v5e"])
            except Exception:
                peak_flops = PEAK_FLOPS["v5e"]
        self.peak_flops = peak_flops
        self.n_devices = max(len(jax.devices()), 1)

    def tick(self) -> Optional[dict]:
        self.n += 1
        if self.n == self.warmup:
            self.t0 = time.perf_counter()
            return None
        if self.t0 is None or self.n <= self.warmup:
            return None
        steps = self.n - self.warmup
        dt = time.perf_counter() - self.t0
        steps_per_sec = steps / dt
        out = {
            "step": self.n,
            "step_ms": 1000.0 / steps_per_sec,
            "items_per_sec": steps_per_sec * self.items_per_step,
            "items_per_sec_per_device": steps_per_sec
            * self.items_per_step
            / self.n_devices,
        }
        if self.flops_per_step:
            # flops_per_step from cost_analysis() is the compiled module's
            # count — per-device under GSPMD partitioning — so per-chip
            # MFU divides by ONE chip's peak (dividing by peak * n_devices
            # double-counted the partitioning on multichip meshes)
            out["mfu"] = (
                self.flops_per_step * steps_per_sec / self.peak_flops
            )
        return out
