"""Utility subsystems: profiling/tracing, timeouts, structured logging."""

from icsg3d_tpu.utils.profiling import StepTimer, flops_of_jitted, trace
from icsg3d_tpu.utils.timeout import TimeoutError_, run_with_timeout

__all__ = [
    "StepTimer",
    "flops_of_jitted",
    "trace",
    "TimeoutError_",
    "run_with_timeout",
]
