"""Metric aggregation and results CSV sink.

Reference conventions preserved (SURVEY.md §5.5): metric namespace
`{split}/{stage}/{metric}`, per-stage `results_{stage}.csv` written under the
experiment directory (`/root/reference/main.py:567-597`), all entropies in
bits.
"""

from __future__ import annotations

import csv
from collections import defaultdict
from pathlib import Path

import numpy as np


class MetricAccumulator:
    """Running mean of scalar logs over an epoch/eval pass."""

    def __init__(self):
        self._sums = defaultdict(float)
        self._counts = defaultdict(int)

    def update(self, logs: dict, weight: int = 1):
        for k, v in logs.items():
            try:
                val = float(v)
            except (TypeError, ValueError):
                continue
            if np.isfinite(val):
                self._sums[k] += val * weight
                self._counts[k] += weight

    def means(self) -> dict:
        return {k: self._sums[k] / self._counts[k] for k in self._sums}

    def reset(self):
        self._sums.clear()
        self._counts.clear()


def namespaced(logs: dict, split: str, stage: str) -> dict:
    return {f"{split}/{stage}/{k}": v for k, v in logs.items()}


def write_results_csv(out_dir, stage: str, metrics: dict) -> Path:
    """One-row CSV of `test/{stage}/...` metrics (main.py:567-597 format)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"results_{stage}.csv"
    keys = sorted(metrics)
    with path.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(keys)
        w.writerow([metrics[k] for k in keys])
    return path


def read_results_csv(path) -> dict:
    with Path(path).open() as f:
        r = list(csv.reader(f))
    return {k: float(v) if _is_float(v) else v for k, v in zip(r[0], r[1])}


def _is_float(s) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


class CsvLogger:
    """Step-series logger (the reference's CSVLogger alternative to wandb).

    Columns are NOT frozen at the first call: rows carrying new metric
    keys (e.g. the first val row after train rows) extend the header by
    rewriting the file once, and on a preemption resume the existing
    file's header is adopted so appended values stay under the right
    columns.
    """

    def __init__(self, out_dir, name: str = "metrics"):
        self.path = Path(out_dir) / f"{name}.csv"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._keys: list[str] | None = None
        if self.path.exists():  # resume: adopt the existing header
            with self.path.open(newline="") as f:
                header = next(csv.reader(f), None)
            if header:
                self._keys = header

    def log(self, step: int, logs: dict):
        row = {"step": step}
        row.update({k: float(v) for k, v in logs.items()
                    if isinstance(v, (int, float)) or _isscalar(v)})
        if self._keys is None:
            self._keys = list(row)
            with self.path.open("w", newline="") as f:
                csv.DictWriter(f, fieldnames=self._keys).writeheader()
        new_keys = [k for k in row if k not in self._keys]
        if new_keys:
            self._rewrite_with_keys(self._keys + new_keys)
        with self.path.open("a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._keys,
                               restval="", extrasaction="ignore")
            w.writerow(row)

    def _rewrite_with_keys(self, keys: list[str]):
        """Extend the header in place (prior rows get empty cells)."""
        with self.path.open(newline="") as f:
            rows = list(csv.DictReader(f))
        self._keys = keys
        with self.path.open("w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys, restval="")
            w.writeheader()
            w.writerows(rows)


def _isscalar(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False
