"""Checkpointing, preemption-safe resume, and stage sentinels.

Mirrors the reference's outer-layer resume design (SURVEY.md §5.3;
`/root/reference/main.py:314-328,465-468,516-535,628-670`):

* `last` checkpoint auto-saved each epoch; training resumes from it.
* best-by-monitor checkpoint kept (save_top_k=1 semantics).
* stage sentinels `{stage}_end.txt`: a finished stage is skipped on restart.
* weights-only export `best_{stage}` for the next stage.

Storage is orbax (async-capable); metadata (step, monitor value) rides along.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_readable(path: Path) -> bool:
    """True when the directory holds a COMMITTED orbax checkpoint —
    distinguishes it from one a crash left partial.

    orbax writes `_CHECKPOINT_METADATA` at finalization, so its presence is
    the commit marker; `metadata()` alone is NOT a valid probe (it returns
    an empty StepMetadata on an empty/partial dir instead of raising).
    Falls back to item metadata readability if the marker file name ever
    changes across orbax versions.
    """
    if (path / "_CHECKPOINT_METADATA").exists():
        return True
    try:
        md = ocp.StandardCheckpointer().metadata(path)
        return getattr(md, "item_metadata", None) is not None
    except Exception:
        return False


def resolve_swap(path: Path) -> Path | None:
    """Resolve — and HEAL — a checkpoint dir written by the tmp/old
    two-rename swap, covering every preemption window.

    The swap is: save to `.tmp` (durable) -> rename path -> `.old` ->
    rename `.tmp` -> path -> delete `.old`. A crash between the two renames
    leaves NO `path` but `.old` plus a COMPLETE `.tmp` (the save +
    wait_until_finished happened before any rename); prefer `.tmp` (newest)
    then `.old`. A bare `.tmp` with no `.old` and no `path` is a save that
    died before the swap began on a first-ever checkpoint — incomplete,
    never resolved. Without this, `restore()`/`has_last` would report "no
    checkpoint" in that window and a resumed run would silently restart
    from step 0 despite durable state on disk.

    Healing (rename the survivor back to `path`, drop leftovers) keeps the
    window from COMPOUNDING: if the un-healed `.tmp` were merely read, the
    next `_atomic_save` would rmtree it (the only newest checkpoint) and a
    second preemption mid-save could leave a partial `.tmp` shadowing the
    complete `.old` — so completeness is verified before preferring `.tmp`,
    and the swap is finished on first touch. Healing failures (read-only
    fs) fall back to returning the survivor unhealed.
    """
    tmp = path.with_name(path.name + ".tmp")
    old = path.with_name(path.name + ".old")
    if path.exists():
        return path
    if old.exists():
        if tmp.exists() and _ckpt_readable(tmp):
            try:
                tmp.rename(path)
                shutil.rmtree(old)
                return path
            except OSError:
                return tmp
        try:
            old.rename(path)
            if tmp.exists():
                shutil.rmtree(tmp)  # partial leftover of the dead save
            return path
        except OSError:
            return old
    return None


class CheckpointManager:
    def __init__(self, ckpt_dir: str | Path, monitor: str = "loss",
                 mode: str = "min"):
        self.dir = Path(ckpt_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self._ckptr = ocp.StandardCheckpointer()
        self._meta_path = self.dir / "meta.json"

    # -- meta ----------------------------------------------------------------

    def _load_meta(self) -> dict:
        if self._meta_path.exists():
            return json.loads(self._meta_path.read_text())
        return {"best_value": None, "last_step": None}

    def _save_meta(self, meta: dict):
        self._meta_path.write_text(json.dumps(meta))

    # -- save / restore ------------------------------------------------------

    def _atomic_save(self, path: Path, state):
        """Write to a sibling tmp dir, then atomically swap into place.

        Deleting the old checkpoint before writing the new one would leave
        NO checkpoint if the job is preempted mid-save — the exact window a
        preemption-safe design must not have. rename() is atomic on one
        filesystem, so `path` (or its healable swap leftovers) always holds
        a complete checkpoint.
        """
        # finish any interrupted swap first: without this, the rmtree below
        # could delete a .tmp that is currently the NEWEST complete
        # checkpoint (crash landed between the swap's two renames)
        resolve_swap(path)
        tmp = path.with_name(path.name + ".tmp")
        if tmp.exists():
            shutil.rmtree(tmp)  # leftover from an interrupted save
        self._ckptr.save(tmp, state)
        self._ckptr.wait_until_finished()
        old = path.with_name(path.name + ".old")
        if old.exists():
            shutil.rmtree(old)
        if path.exists():
            path.rename(old)
        tmp.rename(path)
        if old.exists():
            shutil.rmtree(old)

    def save_last(self, state, step: int):
        self._atomic_save(self.dir / "last", state)
        meta = self._load_meta()
        meta["last_step"] = int(step)
        self._save_meta(meta)

    def maybe_save_best(self, state, step: int, value: float) -> bool:
        """Keep exactly one best checkpoint (utils/helpers.py:312-320).

        A NaN monitor (diverged epoch) is never "best": NaN comparisons are
        all False, so a first-epoch NaN would otherwise be saved and then
        never superseded.
        """
        if value is None or np.isnan(value):
            return False
        meta = self._load_meta()
        best = meta.get("best_value")
        better = (best is None or np.isnan(best) or
                  (value < best if self.mode == "min" else value > best))
        if better:
            self._atomic_save(self.dir / "best", state)
            meta["best_value"] = float(value)
            meta["best_step"] = int(step)
            self._save_meta(meta)
        return better

    def restore(self, target, which: str = "last"):
        path = resolve_swap(self.dir / which)
        if path is None:
            return None
        return self._ckptr.restore(path, target)

    @property
    def has_last(self) -> bool:
        return resolve_swap(self.dir / "last") is not None

    @property
    def best_value(self):
        return self._load_meta().get("best_value")


# -- stage sentinels ---------------------------------------------------------


def stage_sentinel(out_dir: str | Path, stage: str) -> Path:
    return Path(out_dir) / f"{stage}_end.txt"


def is_stage_done(out_dir: str | Path, stage: str) -> bool:
    return stage_sentinel(out_dir, stage).exists()


def mark_stage_done(out_dir: str | Path, stage: str):
    p = stage_sentinel(out_dir, stage)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text("done\n")


def save_weights(path: str | Path, params: Any, batch_stats: Any = None):
    """Weights-only export for the next stage (main.py:516-528).

    BatchNorm running statistics ride along when present — the reference's
    export is a torch state_dict, which includes BN buffers, so dropping
    them here would evaluate resumed ResNet/BN models with fresh stats.
    Models without stats keep the legacy bare-params layout (old exports
    and subtree exports stay loadable).
    """
    path = Path(path).absolute()
    tree = jax.device_get(params)
    if batch_stats:
        tree = {"params": tree, "batch_stats": jax.device_get(batch_stats)}
    # same tmp/old two-rename swap as CheckpointManager._atomic_save: a
    # preemption mid-export must not destroy an existing good export, and
    # deleting the old export before the rename (a long multi-file rmtree
    # of an orbax dir) would open exactly that window.
    # StandardCheckpointer commits asynchronously, so block until durable.
    tmp = path.with_name(path.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, tree)
    ckptr.wait_until_finished()
    old = path.with_name(path.name + ".old")
    if old.exists():
        shutil.rmtree(old)
    if path.exists():
        path.rename(old)
    tmp.rename(path)
    if old.exists():
        shutil.rmtree(old)


def load_weights(path: str | Path, target: Any):
    """Restore a bare-params export (legacy layout) against `target`."""
    p = Path(path).absolute()
    return ocp.StandardCheckpointer().restore(resolve_swap(p) or p, target)


def export_layout_keys(path: str | Path) -> set | None:
    """Top-level keys of a `save_weights` export, or None if unreadable.

    `{"params", "batch_stats"}` identifies the combined layout; anything
    else is a legacy bare-params (or subtree) export.
    """
    try:
        p = Path(path).absolute()
        md = ocp.StandardCheckpointer().metadata(resolve_swap(p) or p)
        tree = getattr(getattr(md, "item_metadata", None), "tree", None)
        if isinstance(tree, dict):
            return set(tree.keys())
    except Exception:
        pass
    return None


def load_state_weights(path: str | Path, params_target: Any,
                       stats_target: Any = None):
    """Restore a `save_weights` export -> (params, batch_stats).

    Handles both layouts: the combined {params, batch_stats} tree written
    for BN models, and the legacy bare-params layout (in which case the
    initialized `stats_target` is returned unchanged, with a warning when
    the model actually carries statistics). Layout is read from checkpoint
    metadata, so genuine restore errors (corruption, shape drift) propagate
    instead of being misread as a layout difference.
    """
    path = Path(path).absolute()
    path = resolve_swap(path) or path
    ckptr = ocp.StandardCheckpointer()
    if export_layout_keys(path) == {"params", "batch_stats"}:
        if stats_target:
            out = ckptr.restore(path, {"params": params_target,
                                       "batch_stats": stats_target})
        else:
            # combined export loaded into a model without initialized stats
            # (caller validates shapes): restore without a target
            out = ckptr.restore(path)
        return out["params"], out["batch_stats"]
    if stats_target:
        import warnings

        warnings.warn(
            f"{path}: export has no batch_stats (legacy layout); "
            "BatchNorm running statistics fall back to init values")
    return ckptr.restore(path, params_target), stats_target
