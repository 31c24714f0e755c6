"""Training loggers: CSV (default), wandb (optional), none.

Logger factory mirroring the reference's (`/root/reference/main.py:434-459`;
`config/logger/*.yaml`): wandb is used when installed and requested, with
group=experiment and a stable run id for preemption continuity; CSV is the
always-available fallback; `none` swallows logs.
"""

from __future__ import annotations

from pathlib import Path


class NoLogger:
    def log(self, step: int, logs: dict):
        pass

    def finish(self):
        pass


class CsvTrainLogger:
    def __init__(self, out_dir, name: str = "metrics"):
        from .metrics import CsvLogger
        self._csv = CsvLogger(out_dir, name)

    def log(self, step: int, logs: dict):
        self._csv.log(step, logs)

    def finish(self):
        pass


class WandbLogger:
    def __init__(self, out_dir, project: str, experiment: str,
                 run_id: str | None = None, config: dict | None = None):
        import wandb  # optional dependency

        self._run = wandb.init(
            project=project, group=experiment, id=run_id, resume="allow",
            dir=str(out_dir), config=config or {})

    def log(self, step: int, logs: dict):
        self._run.log(dict(logs), step=step)

    def finish(self):
        self._run.finish()


def get_logger(mode: str, out_dir, experiment: str = "dev",
               name: str = "metrics", **kwargs):
    """`name` is the CSV file stem — used by csv mode AND by the silent
    CSV fallback when wandb is requested but not installed, so downstream
    consumers find the train log under the same filename either way."""
    if mode in (None, "none"):
        return NoLogger()
    if mode == "csv":
        return CsvTrainLogger(out_dir, name)
    if mode == "wandb":
        try:
            return WandbLogger(out_dir, project=kwargs.pop("project",
                                                           "lossyless_tpu"),
                               experiment=experiment, **kwargs)
        except ImportError:
            return CsvTrainLogger(out_dir, name)
    raise ValueError(f"unknown logger mode {mode}")
