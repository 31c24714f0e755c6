"""Benchmark: STL10-shaped encode throughput of the CLIP compressor.

Measures the deployment hot path (reference baseline: 347.82 img/sec on GPU,
README.md:53): 224px uint8 images -> preprocess -> ViT-B/32 bf16 forward ->
entropy-bottleneck symbols, all as ONE device program scanning over
HBM-resident batches (dataset-axis scaling, SURVEY.md §5.7); host-side rANS
entropy coding runs on a thread pool overlapped with device compute.

Two modes, reported honestly:

* default (the driver's number): image data is DEVICE-RESIDENT (generated
  in HBM). This measures chip + host-rANS throughput and EXCLUDES
  host->device image transfer — the benchmark environment reaches the TPU
  through a low-bandwidth tunnel, so staging host data would measure the
  tunnel, not the chip. The JSON line carries "input": "device_resident".
* `--host-fed`: the REAL deployment path via
  `hub.ClipCompressor.compress_dataset` fed from host-resident raw uint8
  96px (STL10-native) batches — host->device transfer + on-device fused
  resize/normalize + ViT + symbols readback + threaded rANS + file framing.
  On tunneled environments this number is transfer-bound and labeled so.
* `--folder-fed`: DISK -> bitstream end to end — synthetic 96px JPEGs on
  disk, decoded by the parallel prefetching loader (data/loader.py), then
  the same device path as --host-fed. The reference DataLoader pipeline's
  equivalent measurement (hub/compressor.py:186-189).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: do NOT enable jax_compilation_cache_dir here — executable
# serialization wedges the axon TPU backend (client hangs, blocks the chip).

BASELINE_IMG_PER_SEC = 347.82  # reference STL10 encode (README.md:53)
DECODE_BASELINE = 1062.38      # reference unbatched CPU decode (README.md:66)
NORTH_STAR = 5000.0            # BASELINE.json target img/s/chip on v5e
PEAK_BF16_FLOPS = 197e12       # v5e peak dense bf16 (PERF.md headroom chapter)


def _tower_flops_per_img() -> float:
    """Analytic forward FLOPs (2x MACs) of CLIP ViT-B/32 at 224px.

    Patchify conv + 12 x (QKV/out projections + attention dots + 4x MLP)
    + final head projection. Preferred over XLA cost_analysis because the
    benchmark program also contains the XOR-salt preprocess and quantize
    (byte-bound, ~0 FLOPs) and cost_analysis availability varies by backend;
    used for the self-interpreting `device_mfu` field.
    """
    n, d, layers, ff, p = 50, 768, 12, 3072, 32
    per_layer = 2 * (4 * n * d * d + 2 * n * n * d + 2 * n * d * ff)
    patchify = 2 * n * d * (p * p * 3)
    head = 2 * d * 512
    return float(layers * per_layer + patchify + head)

import os as _os

BATCH = int(_os.environ.get("BENCH_BATCH", 512))        # fuller MXU occupancy
# 32 batches (16,384 images, ~2.4GB uint8 HBM) per dispatched window: the
# larger window amortizes per-dispatch/tunnel overhead so the measured
# throughput tracks device capacity even when the tunnel degrades
# (measured: 10.3k -> 14.1k img/s on a degraded tunnel, = capacity)
N_BATCHES = int(_os.environ.get("BENCH_N_BATCHES", 32))


def _median(sorted_vals):
    """Median of an ascending-sorted list (one definition for every
    headline in this bench — encode and decode use the same protocol)."""
    n = len(sorted_vals)
    return sorted_vals[n // 2] if n % 2 else \
        0.5 * (sorted_vals[n // 2 - 1] + sorted_vals[n // 2])


def _probe_device(timeout_s: float = 180.0) -> None:
    """Fail fast if the device (or its tunnel) is unresponsive.

    A wedged TPU-tunnel client blocks inside backend init holding the GIL
    (an in-process watchdog thread can never fire), so probe from a child
    process with a hard timeout; better a clean nonzero exit than an
    indefinite hang.
    """
    import subprocess
    import sys
    import time as _time

    code = "import jax.numpy as jnp; print(float(jnp.ones((8, 8)).sum()))"
    import os

    # observed tunnel-wedge periods run 30-40 min; 12 attempts x ~3.5 min
    # covers one full flap cycle before giving up
    attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "12"))
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s, capture_output=True)
            if r.returncode == 0 and b"64.0" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            pass
        if i + 1 == attempts:
            break  # no misleading 'retrying' + 30s sleep on the last try
        print(f"bench: device unresponsive (probe {i + 1}/{attempts}); "
              "the tunnel sometimes recovers in minutes — retrying",
              file=sys.stderr, flush=True)
        _time.sleep(30)
    print(f"bench: device unresponsive after {attempts} probes, giving up",
          file=sys.stderr, flush=True)
    sys.exit(3)


def main():
    _probe_device()

    from lossyless_tpu.coding import entropy_bottleneck as eb
    from lossyless_tpu.coding.rans import RansCodec
    from lossyless_tpu.hub.load_reference import load_factorized_rate
    from lossyless_tpu.nn.vit import CLIP_MEAN, CLIP_STD, vit_b32

    # real published rate model (b005); CLIP weights random (no egress) —
    # throughput does not depend on weight values
    eb_params_np, scaling_np, biasing_np = load_factorized_rate("b005")
    eb_params = {k: jnp.asarray(v) for k, v in eb_params_np.items()}
    scaling = jnp.asarray(scaling_np)
    biasing = jnp.asarray(biasing_np)

    model = vit_b32()
    params = model.init(jax.random.key(0), jnp.zeros((8, 224, 224, 3)))["params"]
    # store weights bf16: the matmuls consume bf16 anyway, and fp32 storage
    # would make every scan step re-read 2x the bytes just to downcast
    # (LayerNorm params are upcast back to fp32 inside the fp32 LN islands)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    # hub-default arithmetic: tables bit-faithful to the reference coder
    tables = eb.build_cdf_tables(eb_params_np, arithmetic="compressai")
    # auto thread count (cpu_count-matched): oversubscribing a small host
    # only adds scheduler churn alongside the device-readback path
    codec = RansCodec(tables.quantized_cdf, tables.cdf_length, tables.offset)
    indexes = np.arange(512, dtype=np.int32)

    # normalization folded to ONE bf16 FMA: (x/255 - mean)/std == x*a + b
    # (keeps the uint8->bf16 preprocess a single fused pass over the image)
    norm_a = jnp.asarray(1.0 / (255.0 * CLIP_STD), jnp.bfloat16)
    norm_b = jnp.asarray(-CLIP_MEAN / CLIP_STD, jnp.bfloat16)

    # stage the dataset in HBM once (as a real deployment would); generated
    # per-batch in a scan (bounded transients) from raw random bits
    @jax.jit
    def gen_data(seed):
        def step(key, _):
            key, k = jax.random.split(key)
            bits = jax.random.bits(k, (BATCH, 224, 224, 3), jnp.uint8)
            return key, bits
        _, data = jax.lax.scan(step, jax.random.key(seed), None,
                               length=N_BATCHES)
        return data

    data = gen_data(0)
    jax.block_until_ready(data)

    def encode_all(params, data, rep):
        """Preprocess + embed + quantize N_BATCHES HBM-resident batches.

        Symbols leave the device as int8 (small host readback) with an
        on-device overflow counter asserting the narrowing was lossless.
        `rep` perturbs the pixels so repeated timing windows are distinct
        programsxinputs (the device runtime memoizes identical dispatches);
        the XOR fuses into the preprocess read instead of materializing a
        shifted copy of the whole dataset like jnp.roll would.
        """
        rep_u8 = jnp.asarray(rep, jnp.uint8)

        def step(_, xb):
            xb = xb ^ rep_u8
            x = xb.astype(jnp.bfloat16) * norm_a + norm_b
            z = model.apply({"params": params}, x)
            z_in = (z.astype(jnp.float32) + biasing) * jnp.exp(scaling)
            med = eb.medians(eb_params)[None, :]
            sym = jnp.round(z_in - med).astype(jnp.int32)
            overflow = jnp.sum(jnp.abs(sym) > 126)
            return None, (sym.astype(jnp.int8), overflow)
        _, (syms, over) = jax.lax.scan(step, None, data)
        return syms, over.sum()  # (N_BATCHES, BATCH, 512), scalar

    fn = jax.jit(encode_all)
    # compile + warm (incl. one full-size codec call: the first batch encode
    # pre-faults the reused output buffer, a one-time kernel-side cost)
    syms, over = fn(params, data, 99)
    warm_syms = np.asarray(syms).reshape(-1, 512).astype(np.int32)
    assert int(over) == 0
    codec.encode_batch(warm_syms, indexes)

    n_imgs = BATCH * N_BATCHES

    def measure_run(salt_base: int):
        """One full measurement run: REPS pipelined windows, IQM gap stat.

        Returns (img_per_sec, streams, last window's host symbols).
        """
        pool = ThreadPoolExecutor(max_workers=1)
        # steady-state pipeline: keep TWO dispatches in flight so readback +
        # host coding overlap device compute with no bubble between windows
        # (depth 1 leaves a dispatch gap; measured ~10% of throughput).
        REPS = 8
        DEPTH = 2
        marks = [time.time()]
        inflight = [fn(params, data, salt_base + r) for r in range(DEPTH)]
        streams = []
        host_syms = None
        pending = None
        overflows = []
        for rep in range(REPS):
            syms, over = inflight.pop(0)
            nxt = rep + DEPTH
            if nxt < REPS:
                inflight.append(fn(params, data, salt_base + nxt))
            # exactly REPS dispatches total: every result is consumed (the
            # tail windows drain the pipeline; the IQM gap statistic below
            # already discards the extreme windows)
            host_syms = np.asarray(syms).reshape(-1, 512).astype(np.int32)
            overflows.append(over)  # asserted after timing (device scalar)
            # hold the PREVIOUS window's coding future across the next
            # readback so host rANS genuinely overlaps device readback —
            # same double-buffering as hub compress_dataset
            if pending is not None:
                streams = pending.result()
            pending = pool.submit(codec.encode_batch, host_syms, indexes)
            marks.append(time.time())
        streams = pending.result()
        pool.shutdown()
        # every timed window's int8 narrowing was lossless, not just the
        # warm window's (different XOR salts produce different symbols)
        assert sum(int(o) for o in overflows) == 0, "int8 symbol overflow"
        # interquartile-mean inter-completion gap: robust to transient
        # tunnel stalls (which blow up the mean) AND to completion bunching
        # under pipelining (which makes the median/min optimistic)
        gaps = sorted(b - a for a, b in zip(marks, marks[1:]))
        q = len(gaps) // 4
        mid = gaps[q:len(gaps) - q]
        return n_imgs / (sum(mid) / len(mid)), streams, host_syms

    # stability protocol: K independent runs, report the MEDIAN-of-runs as
    # the headline plus the spread — session-to-session chip/tunnel state
    # moves single readings by up to ~20% (PERF.md "Throughput variance"),
    # so a lone IQM window is not interpretable round-over-round.
    RUNS = int(_os.environ.get("BENCH_RUNS", 3))
    runs = [measure_run(100 * (i + 1)) for i in range(RUNS)]
    rates = sorted(r[0] for r in runs)
    img_per_sec = _median(rates)
    streams, last_syms = runs[-1][1], runs[-1][2]
    bits = 8 * np.mean([len(s) for s in streams])

    # decode throughput (host-side threaded batch rANS; reference baseline
    # decodes 1062.38 img/s unbatched on CPU — README.md:66). streams holds
    # one full window (n_imgs messages); warm small, then time the window.
    # Host-side work is at the mercy of ambient host load, so apply the
    # same median-of-RUNS protocol as the encode headline.
    codec.decode_batch(streams[:256], indexes)
    dec_rates = []
    for _ in range(RUNS):
        t0 = time.time()
        decoded = codec.decode_batch(streams, indexes)
        dec_rates.append(len(streams) / (time.time() - t0))
        # roundtrip correctness on the timed path: decoded symbols must
        # equal the last window's device symbols exactly
        assert np.array_equal(decoded, last_syms), "decode roundtrip mismatch"
    dec_rates.sort()
    decode_img_per_sec = _median(dec_rates)

    # device capacity: same program, but only the scalar overflow counter
    # leaves the device — no 4MB symbol readback per window, so the number
    # is independent of tunnel/transfer quality (the primary metric above
    # includes readback + host rANS, as a deployment would)
    cap_fn = jax.jit(lambda p, d, r: encode_all(p, d, r)[1])
    jax.block_until_ready(cap_fn(params, data, 990))
    cmarks = [time.time()]
    cap_inflight = [cap_fn(params, data, 991), cap_fn(params, data, 992)]
    for r in range(6):
        jax.block_until_ready(cap_inflight.pop(0))
        if r + 2 < 6:
            cap_inflight.append(cap_fn(params, data, 993 + r))
        cmarks.append(time.time())
    cgaps = sorted(b - a for a, b in zip(cmarks, cmarks[1:]))
    cmid = cgaps[1:-1] or cgaps
    device_capacity = n_imgs / (sum(cmid) / len(cmid))

    print(json.dumps({
        "metric": "stl10_encode_throughput",
        "value": round(img_per_sec, 2),
        "unit": "img/sec/chip",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
        "value_spread": [round(rates[0], 2), round(rates[-1], 2)],
        "runs": RUNS,
        "input": "device_resident",
        # the tower runs RANDOM weights (no egress): throughput is valid,
        # the coded rate is NOT the published 1506.5 figure — see
        # RATE_PARITY.json for the published-model rate evidence
        "bits_per_img": round(bits, 2),
        "rate_is_synthetic": True,
        "decode_img_per_sec": round(decode_img_per_sec, 2),
        "decode_vs_baseline": round(decode_img_per_sec / DECODE_BASELINE, 3),
        "decode_spread": [round(dec_rates[0], 2), round(dec_rates[-1], 2)],
        "device_capacity_img_per_sec": round(device_capacity, 2),
        # self-interpreting perf context (VERDICT r4 #7): achieved model
        # FLOP utilization of the tower at the headline rate vs v5e peak
        # bf16, and the fraction of the BASELINE.json 5k img/s north star
        "device_mfu": round(img_per_sec * _tower_flops_per_img()
                            / PEAK_BF16_FLOPS, 4),
        "flops_per_img": round(_tower_flops_per_img()),
        "vs_north_star": round(img_per_sec / NORTH_STAR, 3),
    }))


def main_host_fed():
    """Deployment path fed from HOST memory (see module docstring).

    Drives the actual public API — `ClipCompressor.compress_dataset` with
    `raw_input_hw=(96, 96)` so raw STL10-native uint8 crosses the boundary
    (27 KB/img) and resize/normalize fuse into the device encode program.
    """
    _probe_device()

    import tempfile
    from pathlib import Path

    from lossyless_tpu.hub.compressor import ClipCompressor
    from lossyless_tpu.hub.load_reference import load_factorized_rate

    eb_params, scaling, biasing = load_factorized_rate("b005")
    comp = ClipCompressor(eb_params, scaling, biasing,
                          raw_input_hw=(96, 96))

    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (N_BATCHES, BATCH, 96, 96, 3),
                        dtype=np.uint8)    # ~453 MB host-resident at defaults

    with tempfile.TemporaryDirectory() as td:
        # warm: compiles the fused preprocess+encode program untimed
        comp.compress_dataset(iter([(data[0], None)]), Path(td) / "warm.bin",
                              is_info=False)
        t0 = time.time()
        rate, img_per_sec = comp.compress_dataset(
            ((xb, None) for xb in data), Path(td) / "bench.bin",
            is_info=False)
        wall = time.time() - t0
        # warm the dequantize program at the SAME batch shape so decode
        # timing excludes compile/first-touch
        comp.decompress_dataset(Path(td) / "warm.bin", is_info=False,
                                batch_size=BATCH)
        t0 = time.time()
        z_hat = comp.decompress_dataset(Path(td) / "bench.bin",
                                        is_info=False, batch_size=BATCH)
        dec_wall = time.time() - t0
        assert len(z_hat) == BATCH * N_BATCHES

    n_imgs = BATCH * N_BATCHES
    backend = jax.devices()[0].platform
    print(json.dumps({
        "metric": "stl10_encode_throughput_host_fed",
        "value": round(n_imgs / wall, 2),
        "unit": "img/sec/chip",
        "vs_baseline": round((n_imgs / wall) / BASELINE_IMG_PER_SEC, 3),
        "input": "host_resident_uint8_96px",
        "bits_per_img": round(rate, 2),
        "decode_img_per_sec": round(n_imgs / dec_wall, 2),
        "decode_vs_baseline": round((n_imgs / dec_wall) / DECODE_BASELINE, 3),
        "backend": backend,
        "transfer_bound_tunnel": backend == "tpu",
    }))


def stage_jpegs(root, n_imgs: int, side: int, quality: int = 90,
                seed: int = 0) -> list:
    """Write n synthetic natural-ish JPEGs (smooth random gradients + mild
    texture) under `root` — realistic decode cost, unlike pure noise which
    inflates file size. The CANONICAL stager: bin/loader_bench.py imports
    this one so both benches measure the same decode workload."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:side, 0:side].astype(np.float32) / side
    paths = []
    for i in range(n_imgs):
        # 3 random low-frequency gradients + mild texture per image
        freq = rng.uniform(1.0, 6.0, (3, 2)).astype(np.float32)
        phase = rng.uniform(0, 2 * np.pi, (3,)).astype(np.float32)
        base = np.stack([np.sin(2 * np.pi * (f[0] * xx + f[1] * yy) + p)
                         for f, p in zip(freq, phase)], -1)
        img = (127.5 + 100.0 * base
               + rng.normal(0, 12, (side, side, 3))).clip(0, 255)
        p = root / f"{i:06d}.jpg"
        Image.fromarray(img.astype(np.uint8)).save(p, quality=quality)
        paths.append(p)
    return paths


def _stage_jpeg_folder(n_imgs: int, side: int = 96) -> "Path":
    """Stage n synthetic JPEGs (STL10-native 96px) on disk, once per host.

    Honors BENCH_FOLDER_DIR; otherwise a content-keyed dir under /tmp that
    is reused across runs (staging 16k JPEGs costs ~1 min, the bench should
    not pay it every time). The staged-marker is keyed by (n, side) so a
    BENCH_N_BATCHES change restages rather than asserting on a stale count.
    """
    import os
    from pathlib import Path

    root = Path(os.environ.get(
        "BENCH_FOLDER_DIR", f"/tmp/lossyless_bench_jpegs_{n_imgs}_{side}"))
    done = root / f".staged_{n_imgs}_{side}"
    if done.exists():
        return root
    root.mkdir(parents=True, exist_ok=True)
    stage_jpegs(root, n_imgs, side)
    done.touch()
    return root


def main_folder_fed():
    """End-to-end DISK -> bitstream: JPEG folder through the parallel
    prefetching loader (CPU decode) into the device encode path.

    The third labeled mode (VERDICT r4 #8): covers what the reference's
    DataLoader(num_workers=16) pipeline covers — file read + JPEG decode on
    host workers, prefetch overlapping device dispatch, raw 96px uint8
    across the boundary, fused on-device resize/normalize/ViT/quantize,
    threaded rANS, file framing. On tunneled environments the host->device
    leg is transfer-bound and labeled so (same caveat as --host-fed).
    """
    _probe_device()

    import tempfile
    from pathlib import Path

    from lossyless_tpu.data.loader import (decode_image_batch, n_workers,
                                           prefetch)
    from lossyless_tpu.hub.compressor import ClipCompressor
    from lossyless_tpu.hub.load_reference import load_factorized_rate

    n_imgs = BATCH * N_BATCHES
    root = _stage_jpeg_folder(n_imgs)
    # a reused BENCH_FOLDER_DIR may hold more files from a larger prior run
    paths = sorted(root.glob("*.jpg"))[:n_imgs]
    assert len(paths) == n_imgs, (len(paths), n_imgs)

    eb_params, scaling, biasing = load_factorized_rate("b005")
    comp = ClipCompressor(eb_params, scaling, biasing,
                          raw_input_hw=(96, 96))

    def batches():
        for i in range(0, n_imgs, BATCH):
            yield decode_image_batch(paths[i:i + BATCH], (96, 96)), None

    with tempfile.TemporaryDirectory() as td:
        # warm: compile the fused preprocess+encode program untimed
        warm = decode_image_batch(paths[:BATCH], (96, 96))
        comp.compress_dataset(iter([(warm, None)]), Path(td) / "warm.bin",
                              is_info=False)
        t0 = time.time()
        rate, _ = comp.compress_dataset(prefetch(batches()),
                                        Path(td) / "bench.bin",
                                        is_info=False)
        wall = time.time() - t0

    # loader-only throughput on the same files, same process (the decode
    # ceiling this host imposes; deployment sizing = this number x cores)
    t0 = time.time()
    for i in range(0, n_imgs, BATCH):
        decode_image_batch(paths[i:i + BATCH], (96, 96))
    loader_wall = time.time() - t0

    backend = jax.devices()[0].platform
    print(json.dumps({
        "metric": "stl10_encode_throughput_folder_fed",
        "value": round(n_imgs / wall, 2),
        "unit": "img/sec/chip",
        "vs_baseline": round((n_imgs / wall) / BASELINE_IMG_PER_SEC, 3),
        "input": "jpeg_folder_96px",
        "bits_per_img": round(rate, 2),
        "rate_is_synthetic": True,  # random tower + synthetic images
        "loader_img_per_sec": round(n_imgs / loader_wall, 2),
        "loader_workers": n_workers(),
        "backend": backend,
        "transfer_bound_tunnel": backend == "tpu",
    }))


if __name__ == "__main__":
    import sys

    if "--host-fed" in sys.argv:
        main_host_fed()
    elif "--folder-fed" in sys.argv:
        main_folder_fed()
    else:
        main()
