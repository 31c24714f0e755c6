"""Host input-pipeline benchmark: JPEG decode throughput + prefetch overlap.

Measures the `data.loader` pipeline (VERDICT r4 missing #1) with no TPU and
no egress needed:

1. stages N synthetic JPEGs on disk at one or more source resolutions,
2. measures decode+resize throughput (img/s) for a sweep of worker counts,
3. measures the end-to-end overlap win: a simulated consumer (sleep per
   batch, default 17.6 ms/256 imgs = the measured 14.5k img/s device step)
   fed by the serial inline loop vs the prefetched loader.

The reference's loading parallelism is `DataLoader(num_workers=16)`
(/root/reference/hub/compressor.py:186-189); this host has
min(16, os.cpu_count()) workers by default. On a single-core host the
interesting numbers are img/s per worker (for the xN-core extrapolation in
PERF.md) and the prefetch overlap ratio.

Usage: python bin/loader_bench.py [--n 2048] [--sizes 96,224]
       [--workers 0,1,2,4,8,16] [--batch 256] [--consumer-ms 17.6]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# one stager for every bench: both this tool and bench.py --folder-fed must
# measure the SAME synthetic decode workload or their numbers drift apart
from bench import stage_jpegs  # noqa: E402


def decode_throughput(paths, out_hw: tuple[int, int], workers: int,
                      batch: int, reps: int = 3) -> dict:
    os.environ["LOSSYLESS_LOADER_WORKERS"] = str(workers)
    from lossyless_tpu.data import loader

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(0, len(paths), batch):
            loader.decode_image_batch(paths[i:i + batch], out_hw)
        best = min(best, time.perf_counter() - t0)
    return {"metric": "loader_decode", "workers": workers,
            "src_px": None, "out_px": out_hw[0], "n": len(paths),
            "img_per_sec": round(len(paths) / best, 1)}


def overlap_run(paths, out_hw, batch, consumer_s: float, depth: int) -> float:
    """Feed a sleeping consumer; return wall img/s."""
    from lossyless_tpu.data import loader

    def gen():
        for i in range(0, len(paths), batch):
            yield loader.decode_image_batch(paths[i:i + batch], out_hw)

    src = loader.prefetch(gen(), depth=depth)
    n = 0
    t0 = time.perf_counter()
    for x in src:
        time.sleep(consumer_s * len(x) / batch)
        n += len(x)
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--sizes", default="96,224",
                    help="source JPEG resolutions to stage")
    ap.add_argument("--out-px", type=int, default=224,
                    help="decode target (CLIP input)")
    ap.add_argument("--workers", default="0,2,4,8,16")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--consumer-ms", type=float, default=17.6,
                    help="simulated device step per batch (default = the "
                         "measured 14.5k img/s encode at batch 256)")
    ap.add_argument("--dir", default=None,
                    help="stage dir (default: a fresh tempdir)")
    args = ap.parse_args()

    base = Path(args.dir) if args.dir else Path(tempfile.mkdtemp(
        prefix="loader_bench_"))
    base.mkdir(parents=True, exist_ok=True)

    for size in [int(s) for s in args.sizes.split(",")]:
        d = base / f"jpeg{size}"
        if not d.exists() or len(list(d.glob("*.jpg"))) < args.n:
            d.mkdir(exist_ok=True)
            stage_jpegs(d, args.n, size)
        paths = sorted(d.glob("*.jpg"))[:args.n]
        out_hw = (args.out_px, args.out_px)

        for w in [int(w) for w in args.workers.split(",")]:
            r = decode_throughput(paths, out_hw, w, args.batch)
            r["src_px"] = size
            print(json.dumps(r), flush=True)

        if size > args.out_px:
            # downscale source: measure the opt-in libjpeg scaled decode
            os.environ["LOSSYLESS_JPEG_DRAFT"] = "1"
            try:
                r = decode_throughput(paths, out_hw, 0, args.batch)
                r.update(src_px=size, draft=True)
                print(json.dumps(r), flush=True)
            finally:
                os.environ.pop("LOSSYLESS_JPEG_DRAFT", None)

        # overlap: serial inline vs prefetch, against the simulated device
        os.environ["LOSSYLESS_LOADER_WORKERS"] = str(os.cpu_count() or 1)
        cs = args.consumer_ms / 1e3
        serial = overlap_run(paths, out_hw, args.batch, cs, depth=0)
        pre = overlap_run(paths, out_hw, args.batch, cs, depth=2)
        print(json.dumps({
            "metric": "loader_overlap", "src_px": size, "out_px": args.out_px,
            "consumer_ms_per_batch": args.consumer_ms, "batch": args.batch,
            "img_per_sec_serial": round(serial, 1),
            "img_per_sec_prefetch": round(pre, 1),
            "overlap_gain": round(pre / serial, 3)}), flush=True)


if __name__ == "__main__":
    main()
