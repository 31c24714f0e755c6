"""Generate golden coding-vector fixtures for tests/test_golden_streams.py.

For each published rate checkpoint (reference hub/beta*/factorized_rate.pt,
consumed via lossyless_tpu.hub.load_reference), take a fixed deterministic
batch of pseudo-CLIP features, push it through the deployment encode path
(affine -> quantize -> rANS -> dataset framing) and record every intermediate:

  z            (N, 512) float32  input features
  symbols      (N, 512) int32    quantized symbols
  stream_bytes / stream_lens     per-image rANS byte strings (concatenated)
  dataset_bytes                  full bitstream-file framing
  bits_per_img                   8 * mean(len(stream))

The committed fixtures lock (a) the published-checkpoint -> CDF-table path,
(b) the rANS stream format (CompressAI conventions: 16-bit precision, 4-bit
bypass, LIFO flush — reference lossyless/rates.py:556-564), and (c) the
dataset file framing, against future edits. Regenerate ONLY on a deliberate
format change: JAX_PLATFORMS=cpu python bin/make_golden_streams.py
"""

import io
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from lossyless_tpu.coding import entropy_bottleneck as eb  # noqa: E402
from lossyless_tpu.coding.bitstream import write_dataset  # noqa: E402
from lossyless_tpu.coding.rans import RansCodec  # noqa: E402
from lossyless_tpu.hub.load_reference import load_factorized_rate  # noqa: E402

OUT_DIR = Path(__file__).resolve().parents[1] / "tests" / "golden"
N_IMG = 16


def make_one(beta: str) -> None:
    eb_params, scaling, biasing = load_factorized_rate(beta)
    params = {k: jnp.asarray(v) for k, v in eb_params.items()}
    # "compressai" arithmetic: the hub default, bit-faithful to the
    # reference coder's torch-fp32 update() (entropy_bottleneck.py)
    tables = eb.build_cdf_tables(eb_params, arithmetic="compressai")
    codec = RansCodec(tables.quantized_cdf, tables.cdf_length, tables.offset)

    # deterministic pseudo-features, unit-ball-ish like real CLIP embeddings
    rng = np.random.default_rng(20260816)
    z = rng.normal(0.0, 0.35, (N_IMG, 512)).astype(np.float32)

    z_in = (z + biasing) * np.exp(scaling)
    symbols = np.asarray(eb.quantize(params, jnp.asarray(z_in), "symbols"),
                         np.int32)
    indexes = np.arange(512, dtype=np.int32)
    streams = codec.encode_batch(symbols, indexes)
    assert np.array_equal(codec.decode_batch(streams, indexes), symbols)

    buf = io.BytesIO()
    write_dataset(buf, streams, len(streams))

    bits = 8.0 * sum(len(s) for s in streams) / len(streams)
    out = OUT_DIR / f"streams_{beta}.npz"
    np.savez(
        out,
        z=z,
        symbols=symbols,
        stream_bytes=np.frombuffer(b"".join(streams), np.uint8),
        stream_lens=np.asarray([len(s) for s in streams], np.int64),
        dataset_bytes=np.frombuffer(buf.getvalue(), np.uint8),
        bits_per_img=np.float64(bits),
    )
    print(f"{beta}: {bits:.2f} bits/img -> {out}")


def _save_grouped(out, z, streams, z_hat, variables):
    """Save [z_streams, side_streams] grouped byte strings + decoded z_hat.

    The module variables ride along (``params/``- and ``batch_stats/``-
    prefixed, ``/``-joined keys) so the fixture is a self-contained
    (params, z) -> bytes contract: changing the framework's *init defaults*
    must not invalidate the byte pins — only a genuine coding-path change
    may."""
    from flax import traverse_util

    flat = {}
    for col in ("params", "batch_stats"):
        tree = variables.get(col)
        if tree:
            for k, v in traverse_util.flatten_dict(
                    jax.device_get(tree)).items():
                flat[f"{col}/" + "/".join(k)] = np.asarray(v)
    z_streams, side_streams = streams
    np.savez(
        out,
        z=z,
        z_hat=z_hat,
        z_stream_bytes=np.frombuffer(b"".join(z_streams), np.uint8),
        z_stream_lens=np.asarray([len(s) for s in z_streams], np.int64),
        side_stream_bytes=np.frombuffer(b"".join(side_streams), np.uint8),
        side_stream_lens=np.asarray([len(s) for s in side_streams],
                                    np.int64),
        **flat,
    )


def make_hyper() -> None:
    """Golden vectors for the hyperprior coding chain (GaussianConditional:
    64-level scale table, indexed rANS, side-info EB stream)."""
    from lossyless_tpu.compressors.rates import (HRateHyperprior,
                                                 HyperpriorCoder, RateConfig)

    module = HRateHyperprior(16, RateConfig(mode="H_hyper", side_z_dim=10))
    rng = np.random.default_rng(7)
    z = rng.normal(0, 3, (24, 16)).astype(np.float32)
    variables = module.init({"params": jax.random.key(0)}, jnp.asarray(z),
                            None, training=True, rng=jax.random.key(1))
    bs = variables.get("batch_stats")
    coder = HyperpriorCoder(module, jax.device_get(variables["params"]),
                            jax.device_get(bs) if bs else None)
    streams = coder.compress(z)
    z_hat = coder.decompress(streams)
    _save_grouped(OUT_DIR / "streams_hyper.npz", z, streams, z_hat,
                  variables)
    bits = 8 * sum(len(s) for grp in streams for s in grp) / len(z)
    print(f"hyper: {bits:.2f} bits/sample")


def make_spatial() -> None:
    from lossyless_tpu.compressors.rates import (HRateHyperpriorSpatial,
                                                 RateConfig,
                                                 SpatialHyperpriorCoder)

    module = HRateHyperpriorSpatial(64, 4, RateConfig(mode="H_spatial",
                                                      n_channels=4,
                                                      side_z_dim=3))
    rng = np.random.default_rng(8)
    z = rng.normal(0, 3, (6, 64)).astype(np.float32)
    variables = module.init({"params": jax.random.key(0)}, jnp.asarray(z),
                            None, training=True, rng=jax.random.key(1))
    bs = variables.get("batch_stats")
    coder = SpatialHyperpriorCoder(module,
                                   jax.device_get(variables["params"]),
                                   jax.device_get(bs) if bs else None)
    streams = coder.compress(z)
    z_hat = coder.decompress(streams, batch_size=len(z))
    _save_grouped(OUT_DIR / "streams_spatial.npz", z, streams, z_hat,
                  variables)
    bits = 8 * sum(len(s) for grp in streams for s in grp) / len(z)
    print(f"spatial: {bits:.2f} bits/sample")


if __name__ == "__main__":
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for beta in ("b001", "b005", "b01"):
        make_one(beta)
    make_hyper()
    make_spatial()
