"""Profiling + device-memory observability.

Replaces the reference's pynvml/psutil probes (``Stage1_source/
helper_funcs.py:11-31``, logged at ``PL_wrapper.py:1106-1112``) with JAX's
native facilities: per-device HBM statistics and ``jax.profiler`` trace
capture (viewable in TensorBoard / XProf).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


def device_memory_stats(device=None) -> dict:
    """HBM usage for one device, in MB (keys: bytes_in_use, peak_bytes, ...)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {k: v / 1024**2 for k, v in stats.items() if isinstance(v, (int, float))}


def host_memory_mb() -> float:
    """Process RSS in MB (the reference's psutil probe)."""
    try:
        import psutil

        return psutil.Process(os.getpid()).memory_info().rss / 1024**2
    except ImportError:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return float(line.split()[1]) / 1024
        except OSError:
            pass
        return 0.0


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup discard."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._t0 = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")
