"""Aggregator parity: summarize_RD_curves, invariance-RD plot, scatter lines
(reference utils/aggregate.py:364,437,619), driven by the committed banana
sweep artifacts."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from lossyless_tpu.analysis.aggregate import (ResultAggregator,
                                              melt_rate_distortions,
                                              plot_invariance_RD_curve,
                                              plot_scatter_lines,
                                              summarize_RD_curves)

RESULTS = Path(__file__).parents[1] / "results"


@pytest.fixture(scope="module")
def agg():
    return ResultAggregator(RESULTS)


def test_summarize_rd_curves(agg, tmp_path):
    out = summarize_RD_curves(agg.df, compare_cols=("exp",))
    # one row per (curve, distortion_type); banana sweep has 2 experiments
    # x 2 distortion columns
    assert {"AURD_mean", "rate_mindist_curr_mean",
            "rate_mindist_all_mean"} <= set(out.columns)
    assert len(out) == 4
    # VIC sweeps 3 betas -> finite area; VAE has one beta -> NaN by design
    vic = out[out["exp"] == "banana_viz_VIC"]
    assert np.isfinite(vic["AURD_mean"]).all()
    # eps-close-to-own-best rate is within each curve's rate range
    melted = melt_rate_distortions(agg.df, "test/feat/rate",
                                   ("test/feat/distortion",))
    assert (out["rate_mindist_curr_mean"]
            <= melted["rate_val"].max() + 1e-9).all()
    # the 'vs best of ALL models' rate can be NaN (curve never eps-close)
    # but when finite must be >= the own-best rate's minimum over the curve
    fin = out.dropna(subset=["rate_mindist_all_mean"])
    assert len(fin) >= 1


def test_summarize_rd_written_by_facade(agg):
    out = agg.summarize_rd_curves(compare_cols=("exp",))
    assert (RESULTS / "summarized_RD_curves_merged.csv").exists()
    assert len(out) == 4


def test_invariance_rd_curve(agg, tmp_path):
    p = plot_invariance_RD_curve(
        agg.df, tmp_path / "invariance_RD_curve.png",
        col_dist_param="exp", noninvariant="banana_viz_VAE")
    assert Path(p).stat().st_size > 0


def test_scatter_lines(agg, tmp_path):
    p = plot_scatter_lines(agg.df, tmp_path / "s.png", x="beta",
                           y="test/feat/rate", hue="exp", logbase_x=10)
    assert Path(p).stat().st_size > 0
