"""Wall-clock timers for first-class timing metrics.

The reference reports per-image `encoder_time`, `compress_time`,
`receiver_time`, `sender_time`, `inference_time` as logged metrics
(`/root/reference/lossyless/helpers.py:45-56`; SURVEY.md §5.1). Same
contract here; `device_timer` blocks on async dispatch so device work is
actually measured.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class Timer:
    """`with Timer() as t: ...; t.duration` (helpers.py:45-56)."""

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.duration = time.perf_counter() - self._start
        return False


def pipelined_iqm(dispatch, reps: int = 12, depth: int = 2):
    """Time `dispatch(r)` (async device work) with a depth-`depth` pipeline.

    Keeps `depth` results in flight so host readback never leaves a bubble
    between device windows, then reports the interquartile mean of the
    inter-completion gaps — robust to transient stalls (which blow up the
    mean) AND to completion bunching under pipelining (which makes the
    median/min optimistic). `dispatch` must return something
    `jax.block_until_ready` accepts, and must vary its program input with
    `r` (some backends memoize identical dispatches).

    Returns (iqm_seconds, min_seconds). One shared implementation for the
    microbench harnesses (bin/device_step_bench.py, bin/attn_kernel_bench.py,
    bin/step_ablation.py).
    """
    import jax

    marks = [time.perf_counter()]
    inflight = [dispatch(r) for r in range(depth)]
    for r in range(reps):
        jax.block_until_ready(inflight.pop(0))
        nxt = r + depth
        if nxt < reps:
            inflight.append(dispatch(nxt))
        marks.append(time.perf_counter())
    gaps = sorted(b - a for a, b in zip(marks, marks[1:]))
    q = len(gaps) // 4
    mid = gaps[q:len(gaps) - q] or gaps
    return sum(mid) / len(mid), min(gaps)


@contextmanager
def device_timer(result_holder: dict, key: str):
    """Times a block that ends with device work; syncs before stopping."""
    import jax

    start = time.perf_counter()
    try:
        yield
    finally:
        (jax.device_put(0.0) + 0).block_until_ready()
        result_holder[key] = time.perf_counter() - start
