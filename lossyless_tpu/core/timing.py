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
