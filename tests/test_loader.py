"""Parallel prefetching input pipeline: determinism + pipelining contract.

The loader replaces the serial PIL loop the datasets/CLI used through round
4 with the reference's DataLoader-equivalent (16-worker decode + prefetch,
reference hub/compressor.py:186-189). These tests pin the core contract:
IDENTICAL bytes at any worker count and prefetch depth, plus exception
transparency and prompt shutdown of abandoned prefetch threads.
"""

import os
import time

import numpy as np
import pytest

from lossyless_tpu.data import loader


@pytest.fixture
def img_tree(tmp_path):
    """Class-per-subdir folder of mixed-size jpegs/pngs."""
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for ci, cname in enumerate(["a", "b"]):
        d = tmp_path / "imgs" / cname
        d.mkdir(parents=True)
        for i in range(7):
            h, w = int(rng.integers(40, 90)), int(rng.integers(40, 90))
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            p = d / (f"{i}.jpg" if i % 2 else f"{i}.png")
            Image.fromarray(arr).save(p)
            paths.append(p)
    return tmp_path / "imgs", paths


def _with_workers(monkeypatch, n):
    monkeypatch.setenv("LOSSYLESS_LOADER_WORKERS", str(n))


def test_decode_image_batch_matches_serial(img_tree, monkeypatch):
    """Pool decode == the serial PIL loop, byte for byte."""
    from PIL import Image

    _, paths = img_tree
    size = (48, 56)
    expect = np.empty((len(paths), 48, 56, 3), np.uint8)
    for i, p in enumerate(paths):
        img = Image.open(p).convert("RGB")
        if img.size != (56, 48):
            img = img.resize((56, 48), Image.BICUBIC)
        expect[i] = np.asarray(img, np.uint8)

    for workers in (0, 1, 4):
        _with_workers(monkeypatch, workers)
        got = loader.decode_image_batch(paths, size)
        np.testing.assert_array_equal(got, expect)


def test_decode_map_ordered(monkeypatch):
    _with_workers(monkeypatch, 4)
    items = list(range(64))
    assert loader.decode_map(lambda i: i * i, items) == [i * i for i in items]


def test_prefetch_preserves_order_and_values():
    src = [np.full((3,), i) for i in range(20)]
    got = list(loader.prefetch(iter(src), depth=3))
    assert len(got) == 20
    for i, g in enumerate(got):
        np.testing.assert_array_equal(g, src[i])


def test_prefetch_depth_zero_is_inline():
    gen = iter(range(5))
    assert list(loader.prefetch(gen, depth=0)) == [0, 1, 2, 3, 4]


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        raise ValueError("boom")

    it = loader.prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_abandoned_consumer_stops_producer():
    """Closing the consumer early must stop the producer thread promptly
    even when it is blocked on a full queue."""
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = loader.prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()  # triggers the finally: stop + drain + join
    n_after_close = len(produced)
    time.sleep(0.3)
    # producer stopped: no unbounded production after close
    assert len(produced) == n_after_close
    assert n_after_close < 1000


def test_prefetch_actually_overlaps():
    """With a slow producer and slow consumer, prefetch wall time approaches
    max(P, C) rather than P + C (allowing generous margin for CI jitter)."""
    n, p_t, c_t = 8, 0.02, 0.02

    def gen():
        for i in range(n):
            time.sleep(p_t)
            yield i

    t0 = time.perf_counter()
    for _ in loader.prefetch(gen(), depth=2):
        time.sleep(c_t)
    overlapped = time.perf_counter() - t0

    serial = n * (p_t + c_t)
    assert overlapped < serial * 0.85, (overlapped, serial)


def test_streaming_folder_identical_across_workers(img_tree, monkeypatch):
    """StreamingImageFolder yields byte-identical (x, y, aux) batches with
    serial decode + no prefetch vs pooled decode + prefetch."""
    from lossyless_tpu.data.external import StreamingImageFolder

    root, _ = img_tree

    def run(workers, depth):
        _with_workers(monkeypatch, workers)
        monkeypatch.setenv("LOSSYLESS_PREFETCH_DEPTH", str(depth))
        ds = StreamingImageFolder(name="imgs", split=".", data_dir=root.parent,
                                  additional_target="equiv_x")
        return [tuple(np.asarray(a) for a in b)
                for b in ds.batches(4, n_epochs=2, seed=3)]

    serial = run(0, 0)
    parallel = run(8, 3)
    assert len(serial) == len(parallel) > 0
    for s, p in zip(serial, parallel):
        for a, b in zip(s, p):
            np.testing.assert_array_equal(a, b)


def test_cli_folder_batches_identical_across_workers(img_tree, monkeypatch):
    """hub.cli._folder_batches + pil_clip_preprocess: same batches with the
    pool on and off (the deployment path's byte-identity guarantee)."""
    from lossyless_tpu.hub.cli import _folder_batches
    from lossyless_tpu.nn.vit import pil_clip_preprocess

    root, _ = img_tree

    def run(workers, depth):
        _with_workers(monkeypatch, workers)
        monkeypatch.setenv("LOSSYLESS_PREFETCH_DEPTH", str(depth))
        out = []
        for x, y in _folder_batches(root, 4, pil_clip_preprocess):
            out.append((np.asarray(x), None if y is None else np.asarray(y)))
        return out

    serial = run(0, 0)
    parallel = run(6, 2)
    assert len(serial) == len(parallel) > 0
    for (xs, ys), (xp, yp) in zip(serial, parallel):
        np.testing.assert_array_equal(xs, xp)
        if ys is None:
            assert yp is None
        else:
            np.testing.assert_array_equal(ys, yp)


def test_load_image_folder_parallel_identical(img_tree, monkeypatch):
    from lossyless_tpu.data.images import load_image_folder

    root, _ = img_tree
    _with_workers(monkeypatch, 0)
    x0, y0, c0 = load_image_folder(root, (64, 64))
    _with_workers(monkeypatch, 8)
    x1, y1, c1 = load_image_folder(root, (64, 64))
    np.testing.assert_array_equal(x0, x1)
    np.testing.assert_array_equal(y0, y1)
    assert c0 == c1


class TestJpegDraft:
    """Opt-in libjpeg scaled decode (LOSSYLESS_JPEG_DRAFT)."""

    @pytest.fixture
    def big_jpegs(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(7)
        yy, xx = np.meshgrid(np.arange(448), np.arange(448), indexing="ij")
        paths = []
        for i in range(4):
            base = 127 + 80 * np.sin(0.05 * xx + i) * np.cos(0.05 * yy)
            arr = np.clip(base[..., None] + rng.normal(0, 10, (448, 448, 3)),
                          0, 255).astype(np.uint8)
            p = tmp_path / f"{i}.jpg"
            Image.fromarray(arr).save(p, quality=90)
            paths.append(p)
        return paths

    def test_off_by_default_bytes_unchanged(self, big_jpegs, monkeypatch):
        """With the knob unset, decode bytes are the full-resolution path."""
        from PIL import Image

        monkeypatch.delenv("LOSSYLESS_JPEG_DRAFT", raising=False)
        _with_workers(monkeypatch, 0)
        got = loader.decode_image_batch(big_jpegs, (224, 224))
        for i, p in enumerate(big_jpegs):
            img = Image.open(p).convert("RGB").resize((224, 224), Image.BICUBIC)
            np.testing.assert_array_equal(got[i], np.asarray(img, np.uint8))

    def test_draft_close_and_deterministic_across_workers(self, big_jpegs,
                                                          monkeypatch):
        """Draft decode: right shape, visually close to the full decode
        (it IS a different decode), and byte-identical at any worker count."""
        monkeypatch.delenv("LOSSYLESS_JPEG_DRAFT", raising=False)
        _with_workers(monkeypatch, 0)
        full = loader.decode_image_batch(big_jpegs, (224, 224))

        monkeypatch.setenv("LOSSYLESS_JPEG_DRAFT", "1")
        d0 = loader.decode_image_batch(big_jpegs, (224, 224))
        _with_workers(monkeypatch, 4)
        d4 = loader.decode_image_batch(big_jpegs, (224, 224))

        np.testing.assert_array_equal(d0, d4)
        assert d0.shape == full.shape
        # 448->224 is exactly the 1/2 DCT scale: close but not identical
        err = np.abs(d0.astype(np.int16) - full.astype(np.int16)).mean()
        assert err < 8.0, err

    def test_draft_noop_when_target_not_smaller(self, img_tree, monkeypatch):
        """Sources <= target must take the full-decode path: bytes identical
        with the knob on and off (draft only fires on downscale)."""
        _, paths = img_tree  # 40-90 px sources, target 224 upscale
        _with_workers(monkeypatch, 0)
        monkeypatch.delenv("LOSSYLESS_JPEG_DRAFT", raising=False)
        off = loader.decode_image_batch(paths, (224, 224))
        monkeypatch.setenv("LOSSYLESS_JPEG_DRAFT", "1")
        on = loader.decode_image_batch(paths, (224, 224))
        np.testing.assert_array_equal(off, on)


def test_pool_knob_change_does_not_invalidate_old_pool(monkeypatch):
    """Changing LOSSYLESS_LOADER_WORKERS must not shut down the pool a
    still-live user holds (regression: the old get_pool() called
    shutdown(wait=False) on it, racing concurrent prefetch producers into
    'cannot schedule new futures after shutdown')."""
    _with_workers(monkeypatch, 3)
    p3 = loader.get_pool()
    assert p3 is not None
    _with_workers(monkeypatch, 5)
    p5 = loader.get_pool()
    assert p5 is not p3
    # the old pool still schedules work
    assert p3.submit(lambda: 41 + 1).result(timeout=5) == 42
    # flipping back reuses the cached pool rather than building a third
    _with_workers(monkeypatch, 3)
    assert loader.get_pool() is p3


def test_pil_clip_preprocess_honors_draft(tmp_path, monkeypatch):
    """The CLIP-preprocess path (hub CLI compress folder input) must honor
    the draft knob (regression: --jpeg-draft set the env but only
    decode_image_batch read it, so the flag was a silent no-op for every
    CLI input path) — and 'False' in any spelling must disable it."""
    from PIL import Image

    from lossyless_tpu.nn.vit import pil_clip_preprocess

    rng = np.random.default_rng(3)
    yy, xx = np.meshgrid(np.arange(448), np.arange(448), indexing="ij")
    base = 127 + 80 * np.sin(0.04 * xx) * np.cos(0.04 * yy)
    arr = np.clip(base[..., None] + rng.normal(0, 10, (448, 448, 3)),
                  0, 255).astype(np.uint8)
    p = tmp_path / "big.jpg"
    Image.fromarray(arr).save(p, quality=90)

    _with_workers(monkeypatch, 0)
    monkeypatch.delenv("LOSSYLESS_JPEG_DRAFT", raising=False)
    full = pil_clip_preprocess([Image.open(p)])
    monkeypatch.setenv("LOSSYLESS_JPEG_DRAFT", "1")
    draft = pil_clip_preprocess([Image.open(p)])
    assert draft.shape == full.shape == (1, 224, 224, 3)
    # scaled decode is a DIFFERENT decode: close but not identical
    assert not np.array_equal(draft, full)
    assert float(np.abs(draft - full).mean()) < 0.1  # normalized units

    # python-bool spelling disables (case-insensitive falsy parsing)
    monkeypatch.setenv("LOSSYLESS_JPEG_DRAFT", "False")
    off = pil_clip_preprocess([Image.open(p)])
    np.testing.assert_array_equal(off, full)
