"""Golden coding vectors: lock the bitstream format + published-weight path.

Fixtures in tests/golden/ were produced by bin/make_golden_streams.py from
the reference's published rate checkpoints
(/root/reference/hub/beta*/factorized_rate.pt). These tests pin, byte for
byte, the entire deployment coding contract (reference
lossyless/rates.py:556-564 + hub/compressor.py framing): any edit to the
checkpoint loader, CDF-table construction, quantizer, rANS coder, or dataset
framing that changes emitted bytes fails here.
"""

import io
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from lossyless_tpu.coding import entropy_bottleneck as eb
from lossyless_tpu.coding.bitstream import read_dataset, write_dataset
from lossyless_tpu.coding.rans import RansCodec
from lossyless_tpu.hub.load_reference import load_factorized_rate

GOLDEN = Path(__file__).parent / "golden"
BETAS = ("b001", "b005", "b01")


def _load(beta):
    f = np.load(GOLDEN / f"streams_{beta}.npz")
    raw = f["stream_bytes"].tobytes()
    lens = f["stream_lens"]
    streams, ofs = [], 0
    for n in lens:
        streams.append(raw[ofs:ofs + int(n)])
        ofs += int(n)
    return f, streams


@pytest.mark.parametrize("beta", BETAS)
def test_golden_encode_bytes(beta):
    """Published .pt -> tables -> quantize -> encode reproduces golden bytes."""
    eb_params, scaling, biasing = load_factorized_rate(beta)
    params = {k: jnp.asarray(v) for k, v in eb_params.items()}
    tables = eb.build_cdf_tables(eb_params, arithmetic="compressai")
    codec = RansCodec(tables.quantized_cdf, tables.cdf_length, tables.offset)
    f, golden_streams = _load(beta)

    z_in = (f["z"] + biasing) * np.exp(scaling)
    symbols = np.asarray(eb.quantize(params, jnp.asarray(z_in), "symbols"),
                         np.int32)
    np.testing.assert_array_equal(symbols, f["symbols"])

    indexes = np.arange(512, dtype=np.int32)
    streams = codec.encode_batch(symbols, indexes)
    assert streams == golden_streams

    bits = 8.0 * sum(len(s) for s in streams) / len(streams)
    assert bits == pytest.approx(float(f["bits_per_img"]), abs=1e-9)


@pytest.mark.parametrize("beta", BETAS)
def test_golden_decode(beta):
    """Golden byte streams decode to the golden symbols."""
    eb_params, _, _ = load_factorized_rate(beta)
    tables = eb.build_cdf_tables(eb_params, arithmetic="compressai")
    codec = RansCodec(tables.quantized_cdf, tables.cdf_length, tables.offset)
    f, golden_streams = _load(beta)
    decoded = codec.decode_batch(golden_streams, np.arange(512, dtype=np.int32))
    np.testing.assert_array_equal(decoded, f["symbols"])


@pytest.mark.parametrize("beta", BETAS)
def test_golden_dataset_framing(beta):
    """The dataset-file framing is byte-stable and round-trips."""
    f, golden_streams = _load(beta)
    buf = io.BytesIO()
    write_dataset(buf, golden_streams, len(golden_streams))
    assert buf.getvalue() == f["dataset_bytes"].tobytes()
    buf.seek(0)
    assert list(read_dataset(buf)) == golden_streams


def _load_grouped(name):
    f = np.load(GOLDEN / name)

    def split(which):
        raw = f[f"{which}_stream_bytes"].tobytes()
        out, ofs = [], 0
        for n in f[f"{which}_stream_lens"]:
            out.append(raw[ofs:ofs + int(n)])
            ofs += int(n)
        return out
    return f, [split("z"), split("side")]


def _fixture_variables(f):
    """Rebuild {params, batch_stats} from the fixture's flattened arrays —
    the fixture pins (params, z) -> bytes, independent of init defaults."""
    from flax import traverse_util

    out = {}
    for col in ("params", "batch_stats"):
        flat = {tuple(k[len(col) + 1:].split("/")): f[k]
                for k in f.files if k.startswith(col + "/")}
        if flat:
            out[col] = traverse_util.unflatten_dict(flat)
    assert "params" in out, "fixture predates self-contained params"
    return out


def test_golden_hyperprior_streams():
    """Pin the GaussianConditional chain byte-exactly: scale-table CDF
    build, indexed rANS, EB side stream (reference rates.py:697-722)."""
    from lossyless_tpu.compressors.rates import (HRateHyperprior,
                                                 HyperpriorCoder, RateConfig)

    f, golden_streams = _load_grouped("streams_hyper.npz")
    module = HRateHyperprior(16, RateConfig(mode="H_hyper", side_z_dim=10))
    variables = _fixture_variables(f)
    coder = HyperpriorCoder(module, variables["params"],
                            variables.get("batch_stats"))

    streams = coder.compress(f["z"])
    assert len(streams) == len(golden_streams)  # zip must not truncate
    for grp, ggrp in zip(streams, golden_streams):
        assert [bytes(s) for s in grp] == [bytes(s) for s in ggrp]
    z_hat = coder.decompress(golden_streams)
    np.testing.assert_array_equal(z_hat, f["z_hat"])


def test_golden_spatial_streams():
    import jax

    from lossyless_tpu.compressors.rates import (HRateHyperpriorSpatial,
                                                 RateConfig,
                                                 SpatialHyperpriorCoder)

    f, golden_streams = _load_grouped("streams_spatial.npz")
    module = HRateHyperpriorSpatial(64, 4, RateConfig(mode="H_spatial",
                                                      n_channels=4,
                                                      side_z_dim=3))
    variables = _fixture_variables(f)
    coder = SpatialHyperpriorCoder(module, variables["params"],
                                   variables.get("batch_stats"))
    streams = coder.compress(f["z"])
    assert len(streams) == len(golden_streams)  # zip must not truncate
    for grp, ggrp in zip(streams, golden_streams):
        assert [bytes(s) for s in grp] == [bytes(s) for s in ggrp]
    z_hat = coder.decompress(golden_streams, batch_size=len(f["z"]))
    np.testing.assert_array_equal(z_hat, f["z_hat"])
