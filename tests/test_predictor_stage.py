"""Predictor-stage parity: cross-dataset data_pred + on-the-fly featurizer.

Reference behavior under test:
* the probe trains on `data_pred`, which may differ from the featurizer's
  dataset (main.py:277-288) — flagship CLIP flow trains the bottleneck on one
  dataset and probes on others;
* `featurizer.is_on_the_fly` runs the frozen featurizer inside the probe's
  train step with fresh augmentations each epoch (main.py:163,
  predictors.py:41-58).
"""

import dataclasses

import numpy as np
import pytest

from lossyless_tpu.compressors.compressor import (EncoderConfig,
                                                  LossConfig, OnlineEvalConfig)
from lossyless_tpu.compressors.distortions import DistortionConfig
from lossyless_tpu.compressors.rates import RateConfig
from lossyless_tpu.pipeline.config import (DataConfig, ExperimentConfig,
                                           apply_overrides, preset)
from lossyless_tpu.pipeline.predictor import PredictorConfig
from lossyless_tpu.pipeline.run import _predictor_datasets, main


def _tiny_cfg(tmp_path, **kw):
    return ExperimentConfig(
        experiment="test_pred_stage",
        out_dir=str(tmp_path / "results"), ckpt_dir=str(tmp_path / "ckpt"),
        data_feat=DataConfig(name="cifar10", batch_size=64, n_epochs=1,
                             kwargs=dict(synthetic=True, synthetic_n=128)),
        encoder=EncoderConfig(arch="cnn", z_dim=8,
                              arch_kwargs=dict(hid_dim=8)),
        rate=RateConfig(mode="H_factorized"),
        distortion=DistortionConfig(mode="direct", data_mode="image",
                                    arch_kwargs=dict(hid_dim=8)),
        online=OnlineEvalConfig(is_online=False),
        loss=LossConfig(beta=0.1, beta_anneal="constant"),
        predictor=PredictorConfig(n_epochs=2, batch_size=64,
                                  arch_kwargs=dict(hid_dim=32)),
        **kw,
    )


@pytest.mark.slow
def test_cross_dataset_predictor(tmp_path):
    """Featurizer on cifar10, probe on cifar100: B's metrics in the CSVs."""
    cfg = _tiny_cfg(
        tmp_path,
        data_pred=DataConfig(name="cifar100", batch_size=64,
                             kwargs=dict(synthetic=True, synthetic_n=128)),
        is_skip_comm=True,
    )
    metrics = main(cfg)
    assert metrics["data_pred"] == "cifar100"
    assert np.isfinite(metrics["test/pred/loss"])
    assert "test/pred/acc" in metrics
    csv = (cfg.stage_dir / "results_predictor.csv").read_text()
    assert "cifar100" in csv


def test_predictor_datasets_shapes_and_mismatch(tmp_path):
    cfg = _tiny_cfg(
        tmp_path,
        data_pred=DataConfig(name="cifar100",
                             kwargs=dict(synthetic=True, synthetic_n=64)))
    cfg.in_shape = (32, 32, 3)
    cfg.target_shape = 10
    tr, va, target_shape = _predictor_datasets(cfg, None, None)
    assert target_shape == 100           # the PRED dataset's classes
    assert cfg.target_shape == 10        # featurizer shapes untouched
    assert tr.spec.name == "cifar100" and va.split == "test"

    cfg.data_pred = DataConfig(name="mnist",
                               kwargs=dict(synthetic=True, synthetic_n=64))
    with pytest.raises(ValueError, match="input shape"):
        _predictor_datasets(cfg, None, None)


@pytest.mark.slow
def test_onfly_predictor_banana(tmp_path):
    cfg = preset("banana_viz_VIC")
    cfg = apply_overrides(cfg, [
        "data_feat.n_epochs=1", "data_feat.kwargs.length=4096",
        "predictor.n_epochs=2", "predictor.is_on_the_fly=True",
        f"out_dir={tmp_path}/results", f"ckpt_dir={tmp_path}/ckpt",
        "is_skip_comm=True",
    ])
    metrics = main(cfg)
    assert np.isfinite(metrics["test/pred/loss"])


def test_data_pred_override_autocreates():
    cfg = preset("banana_viz_VIC")
    assert cfg.data_pred is None
    cfg = apply_overrides(cfg, ["data_pred.name=cifar10"])
    assert cfg.data_pred is not None
    assert cfg.data_pred.name == "cifar10"
    # inherits data_feat's other fields (reference begin() merge)
    assert cfg.data_pred.batch_size == cfg.data_feat.batch_size
