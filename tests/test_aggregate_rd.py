"""Aggregator parity: summarize_RD_curves, invariance-RD plot, scatter lines
(reference utils/aggregate.py:364,437,619), driven by a synthetic sweep frame
(the live results/ dir changes as sweeps re-run, so tests build their own)."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from lossyless_tpu.analysis.aggregate import (melt_rate_distortions,
                                              plot_invariance_RD_curve,
                                              plot_scatter_lines,
                                              summarize_RD_curves)


@pytest.fixture()
def df():
    rows = []
    for exp, beta_rate_dist in {
        "vic": [(0.02, 8.0, 0.03), (0.07, 6.0, 0.06), (0.2, 4.0, 0.10)],
        "vae": [(0.02, 10.0, 0.05), (0.07, 9.0, 0.06), (0.2, 7.0, 0.11)],
    }.items():
        for seed in (1, 2):
            for beta, rate, dist in beta_rate_dist:
                rows.append({
                    "exp": exp, "datafeat": "banana", "dist": "direct",
                    "enc": "mlp", "rate": "H_factorized", "zdim": 2.0,
                    "beta": beta, "seed": seed,
                    "test/feat/rate": rate + 0.1 * seed,
                    "test/feat/distortion": dist,
                    "test/feat/online_loss": dist * 0.5,
                })
    return pd.DataFrame(rows)


def test_summarize_rd_curves(df):
    out = summarize_RD_curves(df, compare_cols=("exp",))
    # one row per (experiment, distortion_type)
    assert {"AURD_mean", "AURD_sem", "rate_mindist_curr_mean",
            "rate_mindist_all_mean"} <= set(out.columns)
    assert len(out) == 4
    assert np.isfinite(out["AURD_mean"]).all()
    assert (out["AURD_sem"] > 0).all()          # two seeds -> real sem

    # vic reaches the global best distortion; vae's own-best rate is the
    # rate at its lowest-distortion point (mean over the 2 seeds: 10.15)
    vic = out[(out.exp == "vic") &
              (out.distortion_type == "test/feat/distortion")].iloc[0]
    vae = out[(out.exp == "vae") &
              (out.distortion_type == "test/feat/distortion")].iloc[0]
    assert vic["rate_mindist_curr_mean"] == pytest.approx(8.15)
    assert vae["rate_mindist_curr_mean"] == pytest.approx(10.15)
    # vae never gets epsilon-close to vic's best distortion -> NaN
    assert np.isfinite(vic["rate_mindist_all_mean"])
    assert np.isnan(vae["rate_mindist_all_mean"])


def test_melt_rate_distortions(df):
    long = melt_rate_distortions(df, "test/feat/rate",
                                 ("test/feat/distortion",
                                  "test/feat/online_loss"))
    assert len(long) == 2 * len(df)
    assert {"distortion_type", "distortion_val", "rate_val"} <= \
        set(long.columns)


def test_invariance_rd_curve(df, tmp_path):
    p = plot_invariance_RD_curve(df, tmp_path / "invariance_RD_curve.png",
                                 col_dist_param="exp", noninvariant="vae")
    assert Path(p).stat().st_size > 0


def test_scatter_lines(df, tmp_path):
    p = plot_scatter_lines(df, tmp_path / "s.png", x="beta",
                           y="test/feat/rate", hue="exp", logbase_x=10)
    assert Path(p).stat().st_size > 0
