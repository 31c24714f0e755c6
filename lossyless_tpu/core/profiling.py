"""Profiling and debug instrumentation.

Reference equivalents (SURVEY.md §5.1-5.2): Lightning's `profiler=simple`
flag and `torch.autograd.set_detect_anomaly` debug mode become a
`jax.profiler` trace context and `jax_debug_nans`.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str | Path | None):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    if log_dir is None:
        yield
        return
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Per-device memory usage (the reference's GPUStatsMonitor analog,
    config/mode/debug.yaml)."""
    stats = {}
    for d in jax.local_devices():
        s = getattr(d, "memory_stats", lambda: None)()
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return stats


@contextlib.contextmanager
def debug_mode(enable: bool = True):
    """NaN-checking debug mode (reference utils/helpers.py:109-113)."""
    if not enable:
        yield
        return
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)
