"""Tracing / profiling (SURVEY.md §5.1): jax.profiler trace annotations,
optional Perfetto dumps, rays/sec counters, and NaN debugging toggles —
the observability the reference lacks entirely.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_context(name: str):
    """Annotate a region for the jax profiler / Perfetto timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """Capture a full device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compilation_cache(path: str = "~/.cache/mvsnerf_tpu_xla"):
    """Persistent XLA compilation cache: first compiles of the big programs
    (the 3-D U-Net backward takes tens of minutes through some TPU compile
    services) are reused across processes."""
    import os

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def enable_nan_debugging(enable: bool = True):
    """The TPU analog of the reference's global
    torch.autograd.set_detect_anomaly(True) (models.py:2) — but opt-in, not
    an accidental always-on performance tax."""
    jax.config.update("jax_debug_nans", enable)


class ThroughputMeter:
    """rays/sec (or any unit/sec) with warmup skip."""

    def __init__(self, skip: int = 2):
        self.skip = skip
        self._n = 0
        self._units = 0.0
        self._t0 = None

    def step(self, units: float):
        self._n += 1
        if self._n == self.skip:
            self._t0 = time.perf_counter()
            self._units = 0.0
        elif self._n > self.skip:
            self._units += units

    @property
    def rate(self) -> float:
        if self._t0 is None or self._units == 0:
            return 0.0
        return self._units / (time.perf_counter() - self._t0)
