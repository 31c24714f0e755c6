"""Factorized entropy model: likelihood sanity, quantization, coding round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lossyless_tpu.coding import entropy_bottleneck as eb
from lossyless_tpu.coding.rans import RansCodec


@pytest.fixture(scope="module")
def params():
    cfg = eb.EBConfig(channels=8, filters=(3, 3, 3), init_scale=10.0)
    return eb.init_params(cfg, jax.random.key(0))


def test_likelihood_is_valid_pmf(params):
    """Summing P(round(Z)=k) over a wide integer grid ≈ 1 per channel."""
    # init_scale=10 gives a wide-tailed density at init: the grid must cover
    # far past the quantile points for the mass to sum to ~1
    grid = jnp.arange(-300, 301, dtype=jnp.float32)
    z = jnp.tile(grid[:, None], (1, 8))  # (601, 8) "batch" of integer points
    lik = eb.likelihood(params, z)
    totals = lik.sum(axis=0)
    np.testing.assert_allclose(np.asarray(totals), 1.0, atol=1e-3)


def test_likelihood_positive_and_bounded(params):
    z = jax.random.normal(jax.random.key(1), (32, 8)) * 5
    _, lik = eb.forward(params, z, training=False)
    assert np.all(np.asarray(lik) > 0)
    assert np.all(np.asarray(lik) <= 1.0 + 1e-6)


def test_quantize_modes(params):
    z = jax.random.normal(jax.random.key(2), (16, 8)) * 3
    deq = eb.quantize(params, z, "dequantize")
    sym = eb.quantize(params, z, "symbols")
    med = eb.medians(params)[None, :]
    np.testing.assert_allclose(
        np.asarray(deq), np.asarray(sym) + np.asarray(med), atol=1e-5)
    noisy = eb.quantize(params, z, "noise", jax.random.key(3))
    assert np.all(np.abs(np.asarray(noisy - z)) <= 0.5 + 1e-6)


def test_aux_loss_finite_and_trains_quantiles(params):
    loss = eb.aux_loss(params)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: eb.aux_loss(p))(params)
    # only quantiles receive gradient
    assert float(jnp.abs(g["quantiles"]).sum()) > 0
    for k, v in g.items():
        if k != "quantiles":
            assert float(jnp.abs(v).sum()) == 0.0, k


def test_noise_likelihood_grad_flows_to_weights(params):
    def rate(p, z):
        _, lik = eb.forward(p, z, training=True, key=jax.random.key(4))
        return -jnp.log(lik).sum()

    z = jax.random.normal(jax.random.key(5), (16, 8))
    g = jax.grad(rate)(params, z)
    assert float(jnp.abs(g["matrix0"]).sum()) > 0


def test_compress_decompress_roundtrip(params):
    """Full chain: quantize to symbols → rANS → decode → dequantize."""
    tables = eb.build_cdf_tables(params)
    codec = RansCodec(tables.quantized_cdf, tables.cdf_length, tables.offset)

    z = jax.random.normal(jax.random.key(6), (64, 8)) * 4
    symbols = np.asarray(eb.quantize(params, z, "symbols"))
    indexes = np.arange(8, dtype=np.int32)

    streams = codec.encode_batch(symbols, indexes)
    decoded = codec.decode_batch(streams, indexes)
    np.testing.assert_array_equal(decoded, symbols)

    # decoded z_hat equals eval-mode dequantization
    med = np.asarray(eb.medians(params))
    z_hat = decoded + med[None, :]
    np.testing.assert_allclose(
        z_hat, np.asarray(eb.quantize(params, z, "dequantize")), atol=1e-5)


def test_real_rate_close_to_entropy_estimate(params):
    """Actual coded bits ≈ theoretical -log2 likelihood (within overhead)."""
    tables = eb.build_cdf_tables(params)
    codec = RansCodec(tables.quantized_cdf, tables.cdf_length, tables.offset)

    z = jax.random.normal(jax.random.key(7), (256, 8)) * 4
    z_hat, lik = eb.forward(params, z, training=False)
    theoretical_bits = float(-jnp.log2(lik).sum(-1).mean())

    symbols = np.asarray(eb.quantize(params, z, "symbols"))
    streams = codec.encode_batch(symbols, np.arange(8))
    actual_bits = 8 * np.mean([len(s) for s in streams])

    # rANS has per-message constant overhead (~8 bytes state flush)
    assert actual_bits >= theoretical_bits - 1
    assert actual_bits <= theoretical_bits + 80


def test_reference_checkpoint_loads_and_codes():
    """Load published hub weights and verify the full coding path on them."""
    from lossyless_tpu.hub.load_reference import load_factorized_rate

    eb_params_np, scaling, biasing = load_factorized_rate("b005")
    params = {k: jnp.asarray(v) for k, v in eb_params_np.items()}
    assert params["quantiles"].shape == (512, 1, 3)

    tables = eb.build_cdf_tables(params)
    codec = RansCodec(tables.quantized_cdf, tables.cdf_length, tables.offset)

    # synthetic CLIP-like features through the affine: (z + bias) * exp(scale)
    z = jax.random.normal(jax.random.key(8), (16, 512)) * 0.3
    z_in = (z + biasing[None]) * np.exp(scaling)[None]
    symbols = np.asarray(eb.quantize(params, jnp.asarray(z_in), "symbols"))
    streams = codec.encode_batch(symbols, np.arange(512))
    decoded = codec.decode_batch(streams, np.arange(512))
    np.testing.assert_array_equal(decoded, symbols)

    bits = 8 * np.mean([len(s) for s in streams])
    # learned model on ~matching-scale inputs: rate must be in a sane range
    assert 100 < bits < 20000
