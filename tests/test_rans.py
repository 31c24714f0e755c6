"""rANS codec: round-trips, native-vs-Python bitstream identity, escapes."""

import numpy as np
import pytest

from lossyless_tpu.coding import rans
from lossyless_tpu.coding.rans import (RansCodec, _py_decode, _py_encode,
                                       _py_pmf_to_quantized_cdf,
                                       pmf_to_quantized_cdf)


def make_tables(rng, n_cdfs=4, support=16):
    cdfs, lengths, offsets = [], [], []
    max_len = support + 2
    for _ in range(n_cdfs):
        pmf = rng.random(support) + 0.01
        pmf = pmf / pmf.sum() * (1 - 1e-4)
        row = pmf_to_quantized_cdf(np.concatenate([pmf, [1e-4]]))
        padded = np.zeros(max_len + 1, dtype=np.int32)
        padded[: len(row)] = row
        cdfs.append(padded)
        lengths.append(len(row))
        offsets.append(-(support // 2))
    return np.stack(cdfs), np.array(lengths), np.array(offsets)


@pytest.fixture
def codec():
    rng = np.random.default_rng(0)
    cdfs, lengths, offsets = make_tables(rng)
    return RansCodec(cdfs, lengths, offsets)


def test_roundtrip_in_range(codec):
    rng = np.random.default_rng(1)
    n = 1000
    indexes = rng.integers(0, 4, n)
    # in-support given offset -8: -8..7 INCLUSIVE (numpy high is exclusive;
    # 7 is the top boundary value just below the escape bin)
    symbols = rng.integers(-8, 8, n)
    data = codec.encode_with_indexes(symbols, indexes)
    out = codec.decode_with_indexes(data, indexes)
    np.testing.assert_array_equal(out, symbols)


def test_roundtrip_escapes(codec):
    """Out-of-range symbols go through bypass coding and still round-trip."""
    rng = np.random.default_rng(2)
    n = 500
    indexes = rng.integers(0, 4, n)
    symbols = rng.integers(-500, 500, n)
    data = codec.encode_with_indexes(symbols, indexes)
    out = codec.decode_with_indexes(data, indexes)
    np.testing.assert_array_equal(out, symbols)


def test_native_matches_python_bitstream(codec):
    """The C++ stream must be byte-identical to the pure-Python reference."""
    if not codec._use_native:
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(3)
    n = 300
    indexes = rng.integers(0, 4, n).astype(np.int32)
    symbols = rng.integers(-100, 100, n).astype(np.int32)
    native = codec.encode_with_indexes(symbols, indexes)
    pure = _py_encode(symbols, indexes, codec.cdfs, codec.cdf_lengths,
                      codec.offsets)
    assert native == pure
    # and python decode of native stream
    out = _py_decode(native, indexes, codec.cdfs, codec.cdf_lengths,
                     codec.offsets)
    np.testing.assert_array_equal(out, symbols)


def test_batch_matches_single(codec):
    rng = np.random.default_rng(4)
    batch, m = 32, 64
    indexes = rng.integers(0, 4, m)
    symbols = rng.integers(-40, 40, (batch, m))
    streams = codec.encode_batch(symbols, indexes)
    singles = [codec.encode_with_indexes(symbols[i], indexes) for i in range(batch)]
    assert streams == singles
    decoded = codec.decode_batch(streams, indexes)
    np.testing.assert_array_equal(decoded, symbols)


def test_pmf_to_quantized_cdf_properties():
    rng = np.random.default_rng(5)
    for _ in range(20):
        pmf = rng.random(rng.integers(2, 40)) + 1e-6
        pmf = pmf / pmf.sum()
        cdf = pmf_to_quantized_cdf(pmf)
        assert cdf[0] == 0
        assert cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) >= 1)  # every bin non-empty


def test_pmf_to_quantized_cdf_native_matches_python():
    rng = np.random.default_rng(6)
    for _ in range(20):
        pmf = (rng.random(17) + 1e-5).astype(np.float32)
        pmf = pmf / pmf.sum()
        native = pmf_to_quantized_cdf(pmf)
        pure = _py_pmf_to_quantized_cdf(pmf)
        np.testing.assert_array_equal(native, pure)


def test_pmf_with_tiny_mass_bins():
    """Zero-frequency repair (steal-from-smallest) must keep a valid CDF."""
    pmf = np.array([0.5, 1e-12, 0.5 - 1e-12, 1e-12], dtype=np.float64)
    cdf = pmf_to_quantized_cdf(pmf)
    assert np.all(np.diff(cdf) >= 1)
    assert cdf[-1] == 1 << 16


def test_truncated_stream_raises(codec):
    """Corrupt/truncated streams must raise, not return garbage."""
    rng = np.random.default_rng(7)
    indexes = rng.integers(0, 4, 200)
    symbols = rng.integers(-8, 8, 200)
    data = codec.encode_with_indexes(symbols, indexes)
    with pytest.raises(ValueError):
        codec.decode_with_indexes(data[:4], indexes)
    with pytest.raises(ValueError):
        codec.decode_with_indexes(data[: len(data) // 2], indexes)
    # python fallback agrees
    with pytest.raises(ValueError):
        rans._py_decode(data[: len(data) // 2], indexes, codec.cdfs,
                        codec.cdf_lengths, codec.offsets)
    # batch decode flags the offending message
    good = codec.encode_batch(symbols.reshape(4, 50)[:, :50], indexes[:50])
    bad = [good[0], good[1][:4], good[2], good[3]]
    with pytest.raises(ValueError):
        codec.decode_batch(bad, indexes[:50])


def test_out_of_range_index_raises(codec):
    with pytest.raises(IndexError):
        codec.encode_with_indexes([0, 1], [0, 99])
    with pytest.raises(IndexError):
        codec.decode_batch([b"\x00" * 8], np.asarray([99]))
    with pytest.raises(IndexError):  # negative index would read OOB in C++
        codec.decode_batch([b"\x00" * 8], np.asarray([-1]))


def test_extreme_symbol_escapes_roundtrip(codec):
    """INT32-extreme symbols (diverged-model latents) round-trip through the
    escape path, native and Python mirrors byte-identical — the zigzag map
    runs in 64-bit so no signed overflow / oversized shifts."""
    symbols = np.array([np.iinfo(np.int32).min, np.iinfo(np.int32).max,
                        -(1 << 28), (1 << 28), 0, -1], dtype=np.int32)
    indexes = np.zeros(len(symbols), dtype=np.int32)
    data = codec.encode_with_indexes(symbols, indexes)
    py = _py_encode(symbols, indexes, codec.cdfs, codec.cdf_lengths,
                    codec.offsets)
    assert data == py
    out = codec.decode_with_indexes(data, indexes)
    np.testing.assert_array_equal(out, symbols)


def test_length_mismatch_raises(codec):
    with pytest.raises(ValueError):
        codec.encode_with_indexes([0, 1, 2], [0, 1])
    with pytest.raises(ValueError):
        codec.encode_batch(np.zeros((2, 5), np.int32),
                           np.zeros(3, np.int32))
    with pytest.raises(ValueError):
        codec.encode_batch_varidx(np.zeros((2, 5), np.int32),
                                  np.zeros((2, 4), np.int32))
    with pytest.raises(ValueError):
        codec.decode_batch_varidx([b"", b"", b""],
                                  np.zeros((2, 4), np.int32))
