"""Galaxy 37-target regression flow + kaggle submission writer."""

import csv

import jax
import numpy as np
import pytest

from lossyless_tpu.analysis.kaggle import GALAXY_COLUMNS, write_kaggle_submission
from lossyless_tpu.pipeline.predictor import PredictorConfig, PredictorTrainer


def test_regression_predictor_and_kaggle_submission(tmp_path):
    rng = np.random.default_rng(0)
    n, d = 600, 16
    # linear regression targets in [0,1]^37 (galaxy-zoo probabilities)
    W = rng.uniform(-1, 1, (d, 37))
    z = rng.normal(0, 1, (n, d)).astype(np.float32)
    y = 1 / (1 + np.exp(-(z @ W))).astype(np.float32)

    cfg = PredictorConfig(is_classification=False, n_epochs=100, batch_size=100,
                          arch_kwargs=dict(hid_dim=128, n_hid_layers=1),
                          lr=1e-3)
    pt = PredictorTrainer(cfg, d, 37)
    pt.fit(z[:500], y[:500])
    logs = pt.evaluate(z[500:], y[500:])
    assert logs["loss"] < 0.1  # clearly better than predict-the-mean (~0.15)
    assert "tasks_max" in logs and "tasks_median" in logs
    assert logs["tasks_max"] >= logs["tasks_min"]

    preds = pt.predict(z[500:])
    ids = np.arange(100) + 100001
    path = write_kaggle_submission(ids, preds, tmp_path / "submission.csv")
    rows = list(csv.reader(path.open()))
    assert rows[0] == ["GalaxyID"] + GALAXY_COLUMNS
    assert len(rows) == 101
    vals = np.asarray([[float(v) for v in r[1:]] for r in rows[1:]])
    assert vals.min() >= 0.0 and vals.max() <= 1.0  # clipped

    with pytest.raises(ValueError):
        write_kaggle_submission(ids, preds[:, :10], tmp_path / "bad.csv")


@pytest.mark.slow
def test_galaxy_pipeline_emits_submission(tmp_path):
    """The predictor stage writes the kaggle submission automatically for
    galaxy runs (reference main.py:750-825), next to results_predictor.csv."""
    from pathlib import Path

    from lossyless_tpu.cli import main

    metrics = main([
        "galaxy_regression", "data_feat.n_epochs=1", "predictor.n_epochs=2",
        "data_feat.kwargs.synthetic_n=192", "data_pred.kwargs.synthetic_n=192",
        "data_feat.batch_size=64", "data_pred.batch_size=64",
        "is_skip_comm=True", "trainer.log_every=0",
        f"out_dir={tmp_path}/results", f"ckpt_dir={tmp_path}/ckpt",
    ])
    assert "kaggle_submission" in metrics
    subs = list(Path(tmp_path, "results").rglob("kaggle_submission.csv"))
    assert len(subs) == 1
    rows = list(csv.reader(subs[0].open()))
    assert rows[0] == ["GalaxyID"] + GALAXY_COLUMNS
    # one row per held-out sample (synthetic test split), values clipped
    assert len(rows) == 1 + 192
    vals = np.asarray([[float(v) for v in r[1:]] for r in rows[1:]])
    assert vals.min() >= 0.0 and vals.max() <= 1.0
    # submission sits next to the stage CSV
    assert (subs[0].parent / "results_predictor.csv").exists()


def test_drop_last_contract_small_dataset():
    """n < batch_size with drop_last=True yields NO batches (fixed-shape
    contract), not one short batch."""
    from lossyless_tpu.data.external import GalaxyZooDataset

    ds = GalaxyZooDataset(synthetic=True, synthetic_n=10)
    assert list(ds.batches(64, drop_last=True)) == []
    tail = list(ds.batches(64, drop_last=False))
    assert len(tail) == 1 and len(tail[0][0]) == 10
