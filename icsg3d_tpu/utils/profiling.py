"""Profiling and throughput instrumentation.

The reference's only timing was a per-epoch wall-clock print
(vae/lattice_vae.py:312-313).  Here:

- ``trace``: context manager around jax.profiler for on-TPU traces
  viewable in TensorBoard/XProf;
- ``StepTimer``: running step-time/throughput/MFU meter for train loops;
- ``flops_of_jitted``: XLA cost analysis of a jitted function.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

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
            out["mfu"] = (
                self.flops_per_step
                * steps_per_sec
                / (self.peak_flops * self.n_devices)
            )
        return out
