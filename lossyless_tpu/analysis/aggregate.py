"""Result aggregation: collect stage CSVs, summarize, RD curves, Pareto.

Equivalent of `/root/reference/utils/aggregate.py` (`ResultAggregator`):

* `collect_data` globs `results/exp_*/**/results_*.csv` and parses the
  `name_value` path segments back into parameters (aggregate.py:831-840).
* `merge_tables` joins featurizer/communication/predictor rows per run.
* `summarize_metrics` means/sems over seeds (aggregate.py:535).
* `plot_rd_curves` / `plot_pareto_front` render rate-distortion trade-offs
  (aggregate.py:243,302) with matplotlib.
"""

from __future__ import annotations

import math
import re
from pathlib import Path

import numpy as np
import pandas as pd

from ..train.metrics import read_results_csv

STAGES = ("featurizer", "communication", "predictor")

# pretty plot labels (reference utils/postplotting/pretty_renamer.py:5-38)
PRETTY_RENAMER = {
    "test/feat/rate": "Rate [bits]",
    "test/feat/distortion": "Distortion",
    "test/comm/n_bits": "Coded rate [bits]",
    "test/pred/acc": "Test accuracy",
    "test/pred/err": "Test error",
    "beta": r"$\beta$",
    "zdim": r"$\mathrm{dim}(Z)$",
    "dist_direct": "VIC/VAE",
    "dist_contrastive": "BINCE",
    "dist_lossy_Z": "Lossy $Z$",
    "rate_H_factorized": "Factorized prior",
    "rate_H_hyper": "Hyperprior",
    "rate_H_spatial": "Spatial hyperprior",
}


def prettify(name: str) -> str:
    return PRETTY_RENAMER.get(name, name.replace("_", " "))


def path_to_params(path: Path, base: Path) -> dict:
    """Parse `name_value` path segments into a params dict."""
    params = {}
    for seg in path.relative_to(base).parts[:-1]:
        if "_" in seg:
            name, value = seg.split("_", 1)
            try:
                params[name] = float(value) if _is_num(value) else value
            except ValueError:
                params[name] = value
    return params


def _is_num(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def collect_data(results_dir: str | Path,
                 pattern: str = "exp_*/**/results_*.csv") -> pd.DataFrame:
    base = Path(results_dir)
    rows = []
    for csv_path in sorted(base.glob(pattern)):
        stage = re.match(r"results_(\w+)\.csv", csv_path.name).group(1)
        row = dict(path_to_params(csv_path, base))
        row["stage"] = stage
        row["_dir"] = str(csv_path.parent)
        row.update(read_results_csv(csv_path))
        rows.append(row)
    return pd.DataFrame(rows)


def merge_tables(df: pd.DataFrame) -> pd.DataFrame:
    """One row per run, stage metrics side by side (aggregate.py:139-147)."""
    if df.empty:
        return df
    runs = []
    for run_dir, group in df.groupby("_dir"):
        merged = {}
        for _, row in group.iterrows():
            for k, v in row.items():
                if k in ("stage", "_dir"):
                    continue
                if isinstance(v, float) and math.isnan(v):
                    continue  # column absent in this stage's CSV
                merged[k] = v
        merged["_dir"] = run_dir
        runs.append(merged)
    return pd.DataFrame(runs)


def summarize_metrics(df: pd.DataFrame, group_by=None) -> pd.DataFrame:
    """Mean/SEM over seeds (aggregate.py:535)."""
    if df.empty:
        return df
    group_by = group_by or [c for c in ("exp", "datafeat", "dist", "enc",
                                        "rate", "zdim", "beta")
                            if c in df.columns]
    metric_cols = [c for c in df.columns
                   if df[c].dtype.kind in "fc" and c not in group_by]
    agg = df.groupby(group_by, dropna=False)[metric_cols].agg(["mean", "sem"])
    agg.columns = [f"{m}_{s}" for m, s in agg.columns]
    return agg.reset_index()


def is_pareto_optimal(points: np.ndarray) -> np.ndarray:
    """Boolean mask of Pareto-optimal points, both axes minimized
    (aggregate.py:956)."""
    n = len(points)
    mask = np.ones(n, dtype=bool)
    for i in range(n):
        if not mask[i]:
            continue
        dominated = np.all(points <= points[i], axis=1) & \
            np.any(points < points[i], axis=1)
        if dominated.any():
            mask[i] = False
    return mask


def plot_rd_curves(df: pd.DataFrame, out_path, rate_col="test/feat/rate",
                   dist_col="test/feat/distortion", hue="dist"):
    """Rate-distortion curves grouped by `hue` (aggregate.py:243)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    groups = df.groupby(hue) if hue in df.columns else [("all", df)]
    for name, g in groups:
        g = g.sort_values(rate_col)
        ax.plot(g[rate_col], g[dist_col], "o-", label=str(name))
    ax.set_xlabel(prettify(rate_col))
    ax.set_ylabel(prettify(dist_col))
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_pareto_front(df: pd.DataFrame, out_path, rate_col="test/comm/n_bits",
                      err_col="test/pred/err"):
    """Rate vs downstream-error Pareto front (aggregate.py:302)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = df[[rate_col, err_col]].dropna().to_numpy()
    mask = is_pareto_optimal(pts)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.scatter(pts[~mask, 0], pts[~mask, 1], alpha=0.4, label="dominated")
    front = pts[mask][np.argsort(pts[mask, 0])]
    ax.plot(front[:, 0], front[:, 1], "ro-", label="pareto front")
    ax.set_xlabel(prettify(rate_col))
    ax.set_ylabel("Downstream error")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_hypopt(result: dict, out_path):
    """Trial values + best-so-far curve from a `pipeline.hypopt` result
    (the reference's optuna plots, aggregate.py:786)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    trials = result["trials"]
    values = [t["value"] for t in trials]
    best = np.minimum.accumulate(values)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(range(len(values)), values, "o", alpha=0.6, label="trials")
    ax.plot(range(len(values)), best, "r-", label="best so far")
    ax.set_xlabel("trial")
    ax.set_ylabel(prettify(result.get("monitor", "value")))
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


class ResultAggregator:
    """Facade mirroring the reference class (aggregate.py:114)."""

    def __init__(self, results_dir: str | Path):
        self.results_dir = Path(results_dir)
        self.df = merge_tables(collect_data(self.results_dir))

    def summarize(self, **kwargs) -> pd.DataFrame:
        out = summarize_metrics(self.df, **kwargs)
        path = self.results_dir / "summarized_metrics_merged.csv"
        out.to_csv(path, index=False)
        return out

    def rd_curves(self, **kwargs):
        return plot_rd_curves(self.df, self.results_dir / "rd_curves.png",
                              **kwargs)

    def pareto(self, **kwargs):
        return plot_pareto_front(self.df, self.results_dir / "pareto.png",
                                 **kwargs)
