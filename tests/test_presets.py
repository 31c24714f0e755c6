"""Experiment presets: one per reference bin/ experiment group."""

import jax
import numpy as np
import pytest

from lossyless_tpu.pipeline.config import (apply_overrides,
                                           available_presets, preset)


@pytest.mark.parametrize("name", available_presets())
def test_preset_constructs_and_overrides(name):
    cfg = preset(name)
    assert cfg.experiment
    cfg2 = apply_overrides(cfg, ["loss.beta=0.5", "trainer.seed=7"])
    assert cfg2.loss.beta == 0.5 and cfg2.trainer.seed == 7
    assert "beta_5.0e-01" in cfg2.long_name


@pytest.mark.slow
def test_stl10_balle_preset_builds_and_steps():
    """Regression: the balle preset's z_dim/n_channels must satisfy the
    spatial-hyperprior square-latent contract (a TPU smoke run caught a
    mismatched z_dim=128/n_channels=64 config that only fails at init)."""
    import dataclasses

    from lossyless_tpu.compressors.compressor import LearnableCompressor
    from lossyless_tpu.train.state import OptimConfig, TrainState, train_step

    cfg = preset("stl10_balle")
    cfg.in_shape = (96, 96, 3)
    cfg.target_shape = 10
    cfg.aux_shape = (96, 96, 3)
    ccfg = cfg.compressor_config()
    model = LearnableCompressor(ccfg)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 96, 96, 3)).astype(np.float32)
    batch = (x, rng.integers(0, 10, 2).astype(np.int32), x)
    state = TrainState.create(model, batch, jax.random.key(0),
                              main=OptimConfig(lr=1e-3))
    state, logs = train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(logs["loss"]))


def test_frozen_encoder_gets_zero_updates():
    """stag_step2 parity: the reference's Freezer callback -> frozen paths
    receive zero optimizer updates while everything else trains."""
    from lossyless_tpu.compressors.compressor import (
        CompressorConfig, EncoderConfig, LearnableCompressor, LossConfig,
        OnlineEvalConfig)
    from lossyless_tpu.compressors.distortions import DistortionConfig
    from lossyless_tpu.compressors.rates import RateConfig
    from lossyless_tpu.train.state import (OptimConfig, TrainState,
                                           train_step)

    cfg = CompressorConfig(
        encoder=EncoderConfig(arch="mlp", z_dim=4,
                              arch_kwargs=dict(hid_dim=16)),
        rate=RateConfig(mode="H_factorized"),
        distortion=DistortionConfig(mode="direct", data_mode="distribution",
                                    is_classification=False,
                                    arch_kwargs=dict(hid_dim=16)),
        online=OnlineEvalConfig(is_online=False),
        loss=LossConfig(beta=0.1, beta_anneal="constant"),
        in_shape=(2,), target_shape=1, aux_shape=2,
    )
    model = LearnableCompressor(cfg)
    rng = np.random.default_rng(0)
    batch = (rng.normal(size=(8, 2)).astype(np.float32),
             rng.normal(size=(8, 1)).astype(np.float32),
             rng.normal(size=(8, 2)).astype(np.float32))
    state = TrainState.create(model, batch, jax.random.key(0),
                              main=OptimConfig(lr=1e-2),
                              frozen_paths=("p_ZlX",))
    # train_step donates the state, so snapshot params on the host first
    params_before = jax.tree.map(np.asarray, jax.device_get(state.params))
    new_state, _ = train_step(state, batch, jax.random.key(1))

    frozen_before = jax.tree_util.tree_leaves(params_before["p_ZlX"])
    frozen_after = jax.tree_util.tree_leaves(new_state.params["p_ZlX"])
    for a, b in zip(frozen_before, frozen_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    other_before = jax.tree_util.tree_leaves(
        {k: v for k, v in params_before.items() if k != "p_ZlX"})
    other_after = jax.tree_util.tree_leaves(
        {k: v for k, v in new_state.params.items() if k != "p_ZlX"})
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(other_before, other_after))
