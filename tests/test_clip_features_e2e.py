"""CLIP-compressor-on-features end-to-end (the minimal_code.ipynb flow).

Reference protocol (notebooks/minimal_code.ipynb; bottleneck_clip configs):
frozen encoder features -> train factorized entropy bottleneck with lossy_Z
distortion -> compress a dataset to bitstreams -> linear probe on the
decompressed features must match the uncompressed probe.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lossyless_tpu.analysis.linear_eval import z_linear_eval
from lossyless_tpu.compressors.compressor import (CompressorConfig,
                                                  EncoderConfig,
                                                  LearnableCompressor,
                                                  LossConfig,
                                                  OnlineEvalConfig)
from lossyless_tpu.compressors.distortions import DistortionConfig
from lossyless_tpu.compressors.rates import FactorizedCoder, RateConfig
from lossyless_tpu.data.features import FeaturesDataset
from lossyless_tpu.train.state import (OptimConfig, TrainState,
                                       make_generative_epoch)


def make_synthetic_clip_features(n, d=64, n_classes=10, seed=0):
    """Class-clustered unit-norm features (CLIP-embedding-like)."""
    # class centers from a fixed RNG so train/test share them
    center_rng = np.random.default_rng(42)
    centers = center_rng.normal(0, 1, (n_classes, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    y = rng.integers(0, n_classes, n)
    z = centers[y] + rng.normal(0, 0.25, (n, d))
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    return z.astype(np.float32), y


@pytest.mark.slow
def test_feature_compressor_preserves_probe_accuracy():
    d = 64
    z_tr, y_tr = make_synthetic_clip_features(4000, d)
    z_te, y_te = make_synthetic_clip_features(1000, d, seed=1)

    cfg = CompressorConfig(
        encoder=EncoderConfig(arch="identity", z_dim=d),
        rate=RateConfig(mode="H_factorized", eb_filters=(3, 3, 3, 3)),
        distortion=DistortionConfig(mode="lossy_Z", p_norm=1),
        online=OnlineEvalConfig(is_online=False),
        loss=LossConfig(beta=0.01, beta_anneal="constant"),
        in_shape=(d,), target_shape=10, aux_shape=(d,),
    )
    ds = FeaturesDataset(z_tr, y_tr, additional_target="target")
    model = LearnableCompressor(cfg)
    sample_fn = ds.device_sampler(256)
    sample = jax.tree.map(np.asarray, sample_fn(jax.random.key(0)))
    state = TrainState.create(model, sample, jax.random.key(0),
                              main=OptimConfig(lr=1e-3),
                              coder=OptimConfig(lr=1e-3))
    epoch_fn = make_generative_epoch(sample_fn, 100)
    for e in range(20):
        state, logs = epoch_fn(state, jax.random.key(e + 1))
    assert np.isfinite(float(logs["loss"][-1]))

    # real coding of train+test features
    params = jax.device_get(state.params)
    coder = FactorizedCoder({
        "affine": params["rate_estimator"]["affine"],
        "entropy_bottleneck": params["rate_estimator"]["entropy_bottleneck"]})
    s_tr = coder.compress(z_tr)
    s_te = coder.compress(z_te)
    zc_tr = coder.decompress(s_tr)
    zc_te = coder.decompress(s_te)

    bits = 8 * np.mean([len(s) for s in s_te])
    # probes: compressed features must match uncompressed accuracy
    base = z_linear_eval(z_tr, y_tr, z_te, y_te, fixed_C=0.1)
    comp = z_linear_eval(zc_tr, y_tr, zc_te, y_te, fixed_C=0.1)
    assert base["acc"] > 0.9
    assert comp["acc"] > base["acc"] - 0.06
    assert bits < 64 * 32  # actually compressed (vs 2048-bit fp32 raw)
