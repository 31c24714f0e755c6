"""Hub ClipCompressor: dataset round-trip, framing, rate parity plumbing."""

import numpy as np
import pytest

from lossyless_tpu.coding.bitstream import (count_records, read_dataset,
                                            write_dataset)


def test_bitstream_framing_roundtrip(tmp_path):
    records = [b"hello", b"", b"\x00\x01\x02" * 100, b"x"]
    f = tmp_path / "ds.bin"
    write_dataset(f, records, len(records))
    assert count_records(f) == 4
    assert list(read_dataset(f)) == records


def test_bitstream_format_is_reference_layout(tmp_path):
    """Byte-level check of the uint32-BE framing (hub/compressor.py:258-275)."""
    f = tmp_path / "ds.bin"
    write_dataset(f, [b"ab", b"c"], 2)
    raw = f.read_bytes()
    assert raw == (b"\x00\x00\x00\x02"          # n_records
                   b"\x00\x00\x00\x02" b"ab"    # len + payload
                   b"\x00\x00\x00\x01" b"c")


@pytest.fixture(scope="module")
def small_compressor():
    """ClipCompressor with a tiny ViT so CPU tests stay fast."""
    import jax.numpy as jnp

    from lossyless_tpu.coding import entropy_bottleneck as eb
    from lossyless_tpu.hub.compressor import ClipCompressor
    from lossyless_tpu.nn.vit import VisionTransformer
    import jax

    comp = ClipCompressor.__new__(ClipCompressor)
    comp.z_dim = 512
    comp.mesh = None
    comp.raw_input_hw = None
    comp.model = VisionTransformer(patch_size=32, width=64, layers=2, heads=2,
                                   out_dim=512, dtype=jnp.float32)
    dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
    comp.clip_params = comp.model.init(jax.random.key(0), dummy)["params"]

    from lossyless_tpu.hub.load_reference import load_factorized_rate
    eb_params_np, scaling, biasing = load_factorized_rate("b005")
    comp.eb_params = {k: jnp.asarray(v) for k, v in eb_params_np.items()}
    comp.scaling = jnp.asarray(scaling)
    comp.biasing = jnp.asarray(biasing)

    from lossyless_tpu.coding.rans import RansCodec
    tables = eb.build_cdf_tables(eb_params_np)
    comp.codec = RansCodec(tables.quantized_cdf, tables.cdf_length,
                           tables.offset)
    comp.medians_np = np.asarray(eb.medians(eb_params_np))
    comp.indexes = np.arange(512, dtype=np.int32)
    comp._out_scale_np = np.exp(np.asarray(scaling, np.float32))
    comp._biasing_np = np.asarray(biasing, np.float32)
    comp._encode_fn = jax.jit(comp._encode_symbols)
    comp._features_fn = jax.jit(comp._features)
    return comp


def test_compress_decompress_consistency(small_compressor):
    """decompress(compress(x)) must equal the quantized features exactly."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (8, 224, 224, 3)).astype(np.float32)
    streams = small_compressor.compress(x)
    z_hat = small_compressor.decompress(streams)
    features = small_compressor(x)  # dequantize path
    np.testing.assert_allclose(z_hat, features, atol=1e-5)


def test_compress_dataset_roundtrip(tmp_path, small_compressor):
    rng = np.random.default_rng(1)
    batches = [(rng.uniform(-1, 1, (4, 224, 224, 3)).astype(np.float32),
                np.arange(4) + 4 * i) for i in range(3)]
    f, lf = tmp_path / "z.bin", tmp_path / "y.npy"
    rate, enc_speed = small_compressor.compress_dataset(
        iter(batches), f, label_file=lf, is_info=False)
    z_hat, y = small_compressor.decompress_dataset(f, label_file=lf,
                                                   is_info=False)
    assert z_hat.shape == (12, 512)
    np.testing.assert_array_equal(y, np.arange(12))
    # and values match direct compress->decompress
    direct = small_compressor.decompress(
        small_compressor.compress(batches[0][0]))
    np.testing.assert_allclose(z_hat[:4], direct, atol=1e-6)
    assert rate > 100  # plausible bits/img


def test_raw_input_device_preprocess(small_compressor):
    """raw_input_hw: raw uint8 96px batches produce the same streams as
    host-side preprocess + the normalized-input path (the fused device
    resize/normalize is the same clip_preprocess computation)."""
    import dataclasses

    import jax.numpy as jnp

    from lossyless_tpu.nn.vit import clip_preprocess

    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, (4, 96, 96, 3)).astype(np.uint8)

    # reference path: preprocess on host-side jnp, then normalized compress
    pre = np.asarray(clip_preprocess(jnp.asarray(raw, jnp.float32) / 255.0))
    want = small_compressor.compress(pre)

    # raw path: a copy of the compressor with fused device preprocess
    import copy

    comp = copy.copy(small_compressor)
    comp.raw_input_hw = (96, 96)
    import jax

    comp._encode_fn = jax.jit(comp._encode_symbols)
    comp._features_fn = jax.jit(comp._features)
    got = comp.compress(raw)
    assert [g for g in got] == [w for w in want]
