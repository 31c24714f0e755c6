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
    tables = eb.build_cdf_tables(eb_params)
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


if __name__ == "__main__":
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for beta in ("b001", "b005", "b01"):
        make_one(beta)
