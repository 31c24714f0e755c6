"""BALLE spatial latent + H_spatial hyperprior + GDN integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lossyless_tpu.compressors.compressor import (CompressorConfig,
                                                  EncoderConfig,
                                                  LearnableCompressor,
                                                  LossConfig,
                                                  OnlineEvalConfig)
from lossyless_tpu.compressors.distortions import DistortionConfig
from lossyless_tpu.compressors.rates import RateConfig
from lossyless_tpu.train.state import OptimConfig, TrainState, train_step


def test_gdn_forward_and_inverse():
    from lossyless_tpu.nn.layers import GDN

    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 16))
    fwd = GDN(inverse=False)
    v = fwd.init(jax.random.key(1), x)
    y = fwd.apply(v, x)
    assert y.shape == x.shape
    # at init gamma=0.1*I, beta=1: y = x/sqrt(1+0.1 x^2) -> |y| < |x|
    assert float(jnp.abs(y).mean()) < float(jnp.abs(x).mean())
    inv = GDN(inverse=True)
    vi = inv.init(jax.random.key(1), y)
    # inverse GDN expands
    z = inv.apply(vi, y)
    assert float(jnp.abs(z).mean()) > float(jnp.abs(y).mean())


def test_balle_encoder_decoder_shapes():
    from lossyless_tpu.nn.cnn import BalleDecoder, BalleEncoder

    enc = BalleEncoder(out_dim=8 * 2 * 2, in_shape=(32, 32, 3), hid_dim=16,
                       n_layers=4, activation="gdn", norm_layer="identity")
    x = jnp.zeros((2, 32, 32, 3))
    v = enc.init(jax.random.key(0), x)
    z = enc.apply(v, x)
    assert z.shape == (2, 32)  # 8 channels * 2*2 spatial
    assert enc.channel_out_dim == 8

    dec = BalleDecoder(out_shape=(32, 32, 3), in_dim=32, hid_dim=16,
                       n_layers=4, activation="gdn", norm_layer="identity")
    vd = dec.init(jax.random.key(1), z)
    x_hat = dec.apply(vd, z)
    assert x_hat.shape == (2, 32, 32, 3)


def test_balle_h_spatial_trains():
    """BALLE encoder + spatial hyperprior: positions folded into batch."""
    z_dim = 8 * 2 * 2  # 8 channels over a 2x2 latent grid
    cfg = CompressorConfig(
        encoder=EncoderConfig(
            arch="balle", z_dim=z_dim,
            arch_kwargs=dict(hid_dim=16, n_layers=4,
                             norm_layer="identity", activation="gdn")),
        rate=RateConfig(mode="H_spatial", n_channels=8, side_z_dim=10),
        distortion=DistortionConfig(
            mode="direct", data_mode="image", arch="balle",
            arch_kwargs=dict(hid_dim=16, n_layers=4,
                             norm_layer="identity", activation="gdn")),
        online=OnlineEvalConfig(is_online=False),
        loss=LossConfig(beta=0.05, beta_anneal="constant"),
        in_shape=(32, 32, 3), target_shape=10, aux_shape=(32, 32, 3),
    )
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (16, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 10, 16)
    batch = (x, y, x)

    model = LearnableCompressor(cfg)
    state = TrainState.create(model, batch, jax.random.key(0),
                              main=OptimConfig(lr=1e-3))
    losses = []
    for i in range(5):
        state, logs = train_step(state, batch, jax.random.key(i))
        losses.append(float(logs["loss"]))
    assert np.all(np.isfinite(losses))
    # H_spatial logs are scaled by the spatial size
    assert float(logs["H_q_Z"]) > 0


def test_h_spatial_rate_sums_positions():
    """Per-sample rate = sum over the spatial grid of per-position rates."""
    from lossyless_tpu.compressors.rates import (HRateHyperpriorSpatial,
                                                 RateConfig)

    mod = HRateHyperpriorSpatial(
        z_dim=4 * 3 * 3, n_channels=4,
        cfg=RateConfig(mode="H_spatial", side_z_dim=10))
    z = jnp.asarray(np.random.default_rng(0).normal(0, 2, (6, 36)),
                    jnp.float32)
    v = mod.init({"params": jax.random.key(0)}, z, None, training=True,
                 rng=jax.random.key(1))
    z_hat, rates, logs = mod.apply(v, z, None, training=False)
    assert z_hat.shape == z.shape
    assert rates.shape == (6,)
    assert np.all(np.asarray(rates) > 0)


def test_spatial_coder_roundtrip():
    """H_spatial real coding: decode reproduces eval-mode z_hat exactly."""
    from lossyless_tpu.compressors.rates import (HRateHyperpriorSpatial,
                                                 RateConfig,
                                                 SpatialHyperpriorCoder)

    mod = HRateHyperpriorSpatial(
        z_dim=4 * 3 * 3, n_channels=4,
        cfg=RateConfig(mode="H_spatial", side_z_dim=10))
    z = jnp.asarray(np.random.default_rng(0).normal(0, 2, (6, 36)),
                    jnp.float32)
    v = mod.init({"params": jax.random.key(0)}, z, None, training=True,
                 rng=jax.random.key(1))
    coder = SpatialHyperpriorCoder(mod, v["params"], v.get("batch_stats"))
    streams = coder.compress(np.asarray(z))
    z_dec = coder.decompress(streams, batch_size=6)
    z_hat, _, _ = mod.apply(v, z, None, training=False)
    np.testing.assert_allclose(z_dec, np.asarray(z_hat), atol=1e-4)
