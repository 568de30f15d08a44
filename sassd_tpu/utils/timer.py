"""Profiling helpers.

The reference's only instrumentation is TimeCatcher (cuda-synchronized wall
clock, /root/reference/mmdet/core/utils/misc.py:39-56). The TPU equivalents:
`TimeCatcher` blocks on device completion, and `trace` wraps a region with a
jax.profiler trace that can be opened in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time

import jax


class TimeCatcher:
    """with TimeCatcher('stage') as t: ...  — device-synchronized timing."""

    def __init__(self, name: str = "", result=None, verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.elapsed = None
        self._result = result

    def __enter__(self):
        (self._result if self._result is not None
         else jax.device_put(0.0))  # ensure runtime is up
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._result is not None:
            jax.block_until_ready(self._result)
        else:
            # barrier: tiny op forces all prior work on default device
            jax.block_until_ready(jax.device_put(0.0))
        self.elapsed = time.perf_counter() - self.t0
        if self.verbose:
            print(f"[{self.name}] {self.elapsed * 1e3:.2f} ms")
        return False


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Median wall-clock seconds per call of a (jitted) function."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
