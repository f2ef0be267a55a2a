"""Wall-clock timeouts for host-side preprocessing steps.

The reference guarded pathological CIF parses and voxelizations with
func_timeout (utils.py:97,147; create_matrices.py:115,156).  This is the
dependency-free equivalent: SIGALRM-based on the main thread, with a
thread-based fallback elsewhere (the thread variant cannot interrupt C
extensions mid-call; it bounds the wait, not the work).
"""

from __future__ import annotations

import signal
import threading
from typing import Any, Callable


class TimeoutError_(Exception):
    """Raised when a guarded call exceeds its wall-clock budget."""


def _run_with_alarm(fn, seconds, args, kwargs):
    def handler(signum, frame):
        raise TimeoutError_(f"call exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, handler)
    signal.setitimer(signal.ITIMER_REAL, seconds)
    try:
        return fn(*args, **kwargs)
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old)


def _run_with_thread(fn, seconds, args, kwargs):
    result: list = []
    error: list = []

    def target():
        try:
            result.append(fn(*args, **kwargs))
        except Exception as e:  # surface the real exception
            error.append(e)

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        raise TimeoutError_(f"call exceeded {seconds}s")
    if error:
        raise error[0]
    return result[0]


def run_with_timeout(
    fn: Callable, seconds: float, *args: Any, **kwargs: Any
) -> Any:
    """Run fn(*args, **kwargs) with a wall-clock limit; raises TimeoutError_."""
    if threading.current_thread() is threading.main_thread():
        return _run_with_alarm(fn, seconds, args, kwargs)
    return _run_with_thread(fn, seconds, args, kwargs)
