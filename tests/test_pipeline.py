"""3-stage pipeline smoke test (the bin/test.sh equivalent, SURVEY.md §4)."""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.mark.slow
def test_banana_pipeline_dev(tmp_path):
    from lossyless_tpu.cli import main

    metrics = main([
        "banana_viz_VIC", "data_feat.n_epochs=1",
        "data_feat.kwargs.length=4096", "predictor.n_epochs=2",
        f"out_dir={tmp_path}/results", f"ckpt_dir={tmp_path}/ckpt",
    ])
    assert np.isfinite(metrics["test/feat/loss"])
    assert np.isfinite(metrics["test/feat/rate"])
    assert "test/comm/n_bits" in metrics
    assert "test/pred/loss" in metrics

    # per-image timing metrics, reference column names
    # (learnable_compressors.py:182-195, predictors.py:101-112)
    assert metrics["test/feat/encoder_time"] > 0
    assert metrics["test/comm/encoder_time"] > 0
    assert metrics["test/comm/sender_time"] >= metrics["test/comm/compress_time"]
    assert metrics["test/pred/inference_time"] > 0

    # artifacts: stage sentinels + per-stage CSVs + weights export
    out = list(Path(tmp_path, "results").rglob("*"))
    names = {p.name for p in out}
    assert {"featurizer_end.txt", "communication_end.txt",
            "predictor_end.txt"} <= names
    assert {"results_featurizer.csv", "results_communication.csv",
            "results_predictor.csv"} <= names

    # stage skipping on re-run: completed stages are not re-trained
    metrics2 = main([
        "banana_viz_VIC", "data_feat.n_epochs=1",
        "data_feat.kwargs.length=4096",
        f"out_dir={tmp_path}/results", f"ckpt_dir={tmp_path}/ckpt",
    ])
    assert metrics2 == {}  # everything skipped


def test_overrides_and_presets():
    from lossyless_tpu.pipeline.config import (ExperimentConfig,
                                               apply_overrides, preset)

    cfg = preset("banana_viz_VIC")
    cfg = apply_overrides(cfg, [
        "encoder.z_dim=7", "loss.beta=0.5", "rate.mode=H_hyper",
        "data_feat.batch_size=64", "trainer.seed=7",
        "data_feat.kwargs.equivalence=rotation",
    ])
    assert cfg.encoder.z_dim == 7
    assert cfg.loss.beta == 0.5
    assert cfg.rate.mode == "H_hyper"
    assert cfg.data_feat.batch_size == 64
    assert cfg.data_feat.kwargs["equivalence"] == "rotation"

    with pytest.raises(AttributeError):
        apply_overrides(cfg, ["encoder.not_a_field=1"])

    # long_name encodes the config for the aggregator
    assert "beta_5.0e-01" in cfg.long_name
    assert "rate_H_hyper" in cfg.long_name


def test_cli_multirun_sweep(tmp_path):
    """-m expands comma-separated overrides into a cartesian sweep (the
    reference launches RD sweeps via hydra multirun, bin/*/*.sh)."""
    from lossyless_tpu.cli import main

    res = main([
        "banana_viz_VIC", "-m", "loss.beta=0.05,0.2",
        "data_feat.n_epochs=1", "data_feat.kwargs.length=2048",
        "is_only_feat=True", "is_skip_comm=True", "trainer.log_every=0",
        f"out_dir={tmp_path}/results", f"ckpt_dir={tmp_path}/ckpt",
    ])
    assert len(res) == 2
    assert all(np.isfinite(r["metrics"]["test/feat/loss"]) for r in res)
    # each job landed in its own beta-distinguished result dir
    dirs = {p.parent for p in Path(tmp_path, "results").rglob(
        "results_featurizer.csv")}
    assert len(dirs) == 2
    betas = {seg for d in dirs for seg in str(d).split("/")
             if seg.startswith("beta_")}
    assert betas == {"beta_5.0e-02", "beta_2.0e-01"}


def test_train_loss_monitor(tmp_path):
    """checkpoint@bestTrainLoss parity: trainer.monitor=train_loss selects
    the best epoch by epoch-mean TRAIN loss (and feeds the plateau
    controller the same value)."""
    from lossyless_tpu.cli import main

    metrics = main([
        "banana_viz_VIC", "data_feat.n_epochs=2",
        "data_feat.kwargs.length=4096", "predictor.n_epochs=1",
        "trainer.monitor=train_loss",
        f"out_dir={tmp_path}/results", f"ckpt_dir={tmp_path}/ckpt",
    ])
    assert np.isfinite(metrics["test/feat/loss"])
    # a best checkpoint was actually selected under the train monitor
    best = list(Path(tmp_path, "ckpt").rglob("best*"))
    assert best, "no best checkpoint written under train-loss monitoring"


def test_train_loss_monitor_nonfused(tmp_path):
    """Same as above through the per-step (non-fused) train loop."""
    from lossyless_tpu.cli import main

    metrics = main([
        "banana_viz_VIC", "data_feat.n_epochs=1",
        "data_feat.kwargs.length=4096", "predictor.n_epochs=1",
        "trainer.monitor=train_loss", "trainer.use_fused_epochs=False",
        f"out_dir={tmp_path}/results", f"ckpt_dir={tmp_path}/ckpt",
    ])
    assert np.isfinite(metrics["test/feat/loss"])
    best = list(Path(tmp_path, "ckpt").rglob("best*"))
    assert best, "no best checkpoint written under train-loss monitoring"
