"""Parallel, prefetching host input pipeline (reference DataLoader parity).

The reference feeds its deployment path through a torch
`DataLoader(batch_size=128, num_workers=16)` (`/root/reference/hub/
compressor.py:186-189`): 16 workers decode JPEGs while the GPU computes. A
serial PIL loop on the calling thread tops out around 300-800 img/s at CLIP
resolution — enough to starve a chip whose encode step sustains 15k+ img/s.
This module is the host-side equivalent for the TPU pipeline, built on
*threads* instead of worker processes: PIL releases the GIL during JPEG/PNG
decompression and resizing, so a thread pool scales with cores while writing
straight into a shared numpy batch buffer (no pickling across process
boundaries, no copy-on-read).

Two composable pieces, used by `data.external`, `data.images
.load_image_folder`, `nn.vit.pil_clip_preprocess` and `hub.cli`:

* `decode_map(fn, items)` / `decode_image_batch(paths, size)` — ordered
  parallel map over one batch (within-batch parallelism).
* `prefetch(gen, depth)` — run a generator on a daemon thread behind a
  bounded queue, so batch i+1's decode/augment overlaps the consumer's
  device dispatch of batch i (across-batch pipelining; the analogue of the
  DataLoader's `prefetch_factor`).

Determinism contract: identical bytes at ANY worker count and prefetch
depth — the parallel map is ordered and writes disjoint rows, prefetch only
moves *when* work happens, never what (tests/test_loader.py).

Tuning knobs (env): `LOSSYLESS_LOADER_WORKERS` (default: min(16, cpus),
0/1 = serial), `LOSSYLESS_PREFETCH_DEPTH` (default 2, 0 = inline), and
`LOSSYLESS_JPEG_DRAFT` (default 0): when 1, JPEGs whose source resolution
exceeds the decode target are decoded at a reduced DCT scale (PIL
`Image.draft`, the libjpeg scaled-decode path) before the final BICUBIC
resize. This skips the inverse-DCT + resample work above the target
resolution — a 2-4x decode win on large sources (e.g. ImageNet ~500px ->
224) — at the cost of slightly different pixels than full-resolution
decode + resize, so it is OPT-IN and never changes bytes when off
(tests/test_loader.py pins both properties).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Sequence

import numpy as np

# one pool per worker count, never shut down mid-process: shutting down the
# old pool when the knob changes would race a still-live user of it (e.g. a
# prefetch producer from an earlier dataset) into "cannot schedule new
# futures after shutdown". Knob flips are a bench/test pattern, so at most a
# handful of pools exist; idle threads cost nothing and join at exit.
_POOLS: dict[int, ThreadPoolExecutor] = {}
_POOL_LOCK = threading.Lock()


def n_workers() -> int:
    """Decode workers: env override, else min(16, cpu_count) like the
    reference's num_workers=16 default capped to the actual host."""
    env = os.environ.get("LOSSYLESS_LOADER_WORKERS")
    if env is not None:
        return max(0, int(env))
    return min(16, os.cpu_count() or 1)


def prefetch_depth() -> int:
    env = os.environ.get("LOSSYLESS_PREFETCH_DEPTH")
    return max(0, int(env)) if env is not None else 2


def jpeg_draft_enabled() -> bool:
    """Opt-in libjpeg scaled decode for sources larger than the target.

    Falsy spellings in any case ('0', '', 'false', 'no', 'off') disable —
    a user exporting a Python bool ('False') must not silently get
    different pixels than the full-resolution path they asked for.
    """
    v = os.environ.get("LOSSYLESS_JPEG_DRAFT", "0").strip().lower()
    return v not in ("0", "", "false", "no", "off")


def get_pool() -> ThreadPoolExecutor | None:
    """Shared decode pool for the current worker knob (lazy, cached).

    Returns None when workers <= 1: the serial path then runs inline with
    zero thread overhead (and keeps single-core test runs deterministic in
    their scheduling).
    """
    w = n_workers()
    if w <= 1:
        return None
    with _POOL_LOCK:
        pool = _POOLS.get(w)
        if pool is None:
            pool = _POOLS[w] = ThreadPoolExecutor(
                w, thread_name_prefix=f"lossyless-io-{w}")
        return pool


def decode_map(fn: Callable, items: Sequence) -> list:
    """Ordered parallel map over one batch (identity to [fn(i) for i])."""
    pool = get_pool()
    if pool is None or len(items) <= 1:
        return [fn(it) for it in items]
    return list(pool.map(fn, items))


def decode_image_batch(paths: Sequence, size: tuple[int, int]) -> np.ndarray:
    """Decode+resize a batch of image files to a (B, H, W, 3) uint8 array.

    Same PIL operations as a serial loop (`convert("RGB")`, BICUBIC resize
    when the size differs) executed by the shared pool; each worker writes
    its own disjoint output rows.
    """
    from PIL import Image

    h, w = size
    out = np.empty((len(paths), h, w, 3), np.uint8)
    draft = jpeg_draft_enabled()

    def _one(i_p):
        i, p = i_p
        img = Image.open(p)
        if draft and img.format == "JPEG" and \
                (img.size[0] > w or img.size[1] > h):
            # libjpeg decodes at the smallest DCT scale (1/1..1/8) still
            # >= the target; must be requested before pixel access
            img.draft("RGB", (w, h))
        img = img.convert("RGB")
        if img.size != (w, h):
            img = img.resize((w, h), Image.BICUBIC)
        out[i] = np.asarray(img, np.uint8)

    pool = get_pool()
    if pool is None or len(paths) <= 1:
        for ip in enumerate(paths):
            _one(ip)
    else:
        # consume the iterator so worker exceptions surface here, in order
        list(pool.map(_one, enumerate(paths)))
    return out


class _Raised:
    """Exception carrier across the prefetch queue."""

    def __init__(self, exc: BaseException):
        self.exc = exc


_DONE = object()


def prefetch(gen: Iterable, depth: int | None = None) -> Iterator:
    """Yield from `gen`, produced on a daemon thread `depth` items ahead.

    Order-preserving and exception-transparent: whatever `gen` raises is
    re-raised at the consumer's next pull. Abandoning the returned generator
    (garbage collection / .close()) stops the producer thread promptly —
    its queue puts poll a stop flag rather than blocking forever.
    """
    if depth is None:
        depth = prefetch_depth()
    if depth <= 0:
        yield from gen
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _work():
        try:
            for item in gen:
                if not _put(item):
                    return
            _put(_DONE)
        except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
            _put(_Raised(e))

    thread = threading.Thread(target=_work, daemon=True,
                              name="lossyless-prefetch")
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, _Raised):
                raise item.exc
            yield item
    finally:
        stop.set()
        # unblock a producer waiting on a full queue, then let it finish
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        thread.join(timeout=5.0)
