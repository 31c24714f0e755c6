"""Aux subsystems: hub export, hypopt, label augment, loggers, annealer,
checkpoint manager."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_save_hub_roundtrip(tmp_path):
    from lossyless_tpu.coding import entropy_bottleneck as eb
    from lossyless_tpu.hub.save_hub import load_hub_npz, save_hub

    cfg = eb.EBConfig(channels=8, filters=(3, 3, 3))
    ebp = eb.init_params(cfg, jax.random.key(0))
    params = {"rate_estimator": {
        "affine": {"scaling": jnp.ones(8), "biasing": jnp.zeros(8)},
        "entropy_bottleneck": ebp,
    }}
    out = save_hub(params, tmp_path, beta=0.05)
    assert (out / "factorized_rate.npz").exists()
    eb2, scaling, biasing = load_hub_npz(out / "factorized_rate.npz")
    np.testing.assert_allclose(scaling, np.ones(8))
    for k in ebp:
        np.testing.assert_allclose(eb2[k], np.asarray(ebp[k]), atol=1e-7)

    # the .pt export loads through the reference-checkpoint loader; with
    # torch importable the export MUST exist (a silent skip here would let
    # a save_hub regression drop the .pt without any test noticing)
    try:
        import torch  # noqa: F401
        has_torch = True
    except ImportError:
        has_torch = False
    if has_torch:
        assert (out / "factorized_rate.pt").exists()
        from lossyless_tpu.hub.load_reference import load_factorized_rate
        eb3, s3, b3 = load_factorized_rate(out / "factorized_rate.pt")
        for k in ebp:
            np.testing.assert_allclose(eb3[k], np.asarray(ebp[k]), atol=1e-7)


def test_hypopt_random_search(tmp_path):
    from lossyless_tpu.pipeline.config import preset
    from lossyless_tpu.pipeline.hypopt import hypopt

    calls = []

    def fake_run(cfg):
        calls.append(cfg.loss.beta)
        # pretend the monitor is minimized at beta=0.1
        return {"val/feat/loss": abs(np.log10(cfg.loss.beta) + 1)}

    res = hypopt(preset("banana_viz_VIC"),
                 {"loss.beta": ("log_uniform", 1e-3, 1.0)},
                 monitor="val/feat/loss", n_trials=6, run_fn=fake_run,
                 out_file=tmp_path / "hypopt.json")
    assert len(calls) == 6
    assert res["best"]["value"] == min(t["value"] for t in res["trials"])
    assert json.loads((tmp_path / "hypopt.json").read_text())["monitor"]


def test_hypopt_median_pruning(tmp_path):
    """prune=True: every trial runs a short featurizer-only rung; trials
    with rung loss above the running median stop there (median-stop)."""
    from lossyless_tpu.pipeline.config import preset
    from lossyless_tpu.pipeline.hypopt import hypopt

    calls = []

    def fake_run(cfg):
        calls.append((cfg.is_only_feat, cfg.data_feat.n_epochs))
        v = abs(np.log10(cfg.loss.beta) + 1)
        return {"test/feat/loss": v, "val/feat/loss": v}

    n = 8
    res = hypopt(preset("banana_viz_VIC"),
                 {"loss.beta": ("log_uniform", 1e-3, 1.0)},
                 monitor="val/feat/loss", n_trials=n, run_fn=fake_run,
                 prune=True, rung_fraction=0.25)
    pruned = [t for t in res["trials"] if t.get("pruned")]
    full = [t for t in res["trials"] if not t.get("pruned")]
    assert pruned, "median-stop should stop at least one of 8 trials"
    assert full, "some trials must survive to the full budget"
    rungs = [c for c in calls if c[0]]
    assert len(rungs) == n                       # every trial ran a rung
    assert all(c[1] == 25 for c in rungs)        # 0.25 * 100 epochs
    assert len(calls) == n + len(full)           # full runs only survive
    # pruned trials carry the worst value so best-selection ignores them
    assert res["best"]["value"] == min(t["value"] for t in full)


def test_equivariant_crop_resamples_labels():
    from lossyless_tpu.data.label_augment import EquivariantRandomResizedCrop

    aug = EquivariantRandomResizedCrop(invariant_scale=(0.99, 1.0),
                                       equivariant_scale=(0.1, 1.0),
                                       p=1.0, num_classes=10)
    x = jnp.ones((64, 16, 16, 1))
    y = jnp.zeros((64,), jnp.int32)
    x2, y2 = jax.jit(aug)(jax.random.key(0), x, y)
    assert x2.shape == x.shape
    # almost all crops land in the (huge) equivariant range -> labels change
    assert float((y2 != y).mean()) > 0.7

    aug_inv = EquivariantRandomResizedCrop(invariant_scale=(0.1, 1.0),
                                           equivariant_scale=(0.1, 1.0),
                                           p=1.0, num_classes=10)
    _, y3 = jax.jit(aug_inv)(jax.random.key(0), x, y)
    assert float((y3 != y).mean()) == 0.0  # no equivariant range -> invariant

    with pytest.raises(ValueError):
        EquivariantRandomResizedCrop(invariant_scale=(0.05, 1.0),
                                     equivariant_scale=(0.1, 1.0))


def test_annealer_modes():
    from lossyless_tpu.core.annealer import Annealer

    lin = Annealer(0.0, 1.0, 10, mode="linear")
    assert float(lin(0)) == 0.0
    assert float(lin(5)) == pytest.approx(0.5)
    assert float(lin(100)) == 1.0

    geo = Annealer(1e-5, 1.0, 10, mode="geometric")
    assert float(geo(0)) == pytest.approx(1e-5)
    assert float(geo(10)) == pytest.approx(1.0, rel=1e-4)

    const = Annealer(0.3, 0.7, 10, mode="constant")
    assert float(const(0)) == pytest.approx(0.7)

    delayed = Annealer(0.0, 1.0, 10, start_step=5, default=-1.0,
                       mode="linear")
    assert float(delayed(3)) == -1.0
    assert float(delayed(15)) == 1.0


def test_checkpoint_manager(tmp_path):
    from lossyless_tpu.train.checkpoints import (CheckpointManager,
                                                 is_stage_done,
                                                 mark_stage_done)

    state = {"w": np.arange(4.0), "step": np.asarray(3)}
    mgr = CheckpointManager(tmp_path / "ck", monitor="loss", mode="min")
    mgr.save_last(state, 3)
    assert mgr.has_last
    assert mgr.maybe_save_best(state, 3, 1.0)
    assert not mgr.maybe_save_best(state, 4, 2.0)  # worse -> not saved
    assert mgr.maybe_save_best({"w": np.ones(4), "step": np.asarray(9)}, 9,
                               0.5)
    restored = mgr.restore(state, "best")
    np.testing.assert_allclose(restored["w"], np.ones(4))
    assert mgr.best_value == 0.5

    assert not is_stage_done(tmp_path, "featurizer")
    mark_stage_done(tmp_path, "featurizer")
    assert is_stage_done(tmp_path, "featurizer")


def test_loggers(tmp_path):
    from lossyless_tpu.train.loggers import get_logger

    lg = get_logger("csv", tmp_path)
    lg.log(1, {"loss": 0.5})
    lg.log(2, {"loss": 0.25})
    assert (tmp_path / "metrics.csv").read_text().count("\n") == 3

    assert get_logger("none", tmp_path).log(1, {}) is None
    # wandb not installed -> falls back to CSV silently
    lg2 = get_logger("wandb", tmp_path / "w")
    lg2.log(1, {"a": 1.0})


def test_hypopt_optuna_prune_wiring(monkeypatch, tmp_path):
    """With optuna present and prune=True the objective REPORTS a rung value
    and raises TrialPruned when the pruner says so (was a silent no-op)."""
    import sys
    import types

    import numpy as _np

    from lossyless_tpu.pipeline.config import preset

    class TrialPruned(Exception):
        pass

    class FakeTrial:
        def __init__(self, number, beta, prune_me):
            self.number = number
            self._beta = beta
            self._prune_me = prune_me
            self.reported = []
            self.params = {}
            self.value = None
            self.state = types.SimpleNamespace(name="RUNNING")

        def suggest_float(self, name, lo, hi, log=False):
            self.params[name] = self._beta
            return self._beta

        def report(self, value, step):
            self.reported.append((value, step))

        def should_prune(self):
            return self._prune_me

    class FakeStudy:
        def __init__(self):
            self.trials = []
            self.best_value = None
            self.best_params = None

        def optimize(self, objective, n_trials):
            for i in range(n_trials):
                t = FakeTrial(i, beta=0.1 * (i + 1), prune_me=(i % 2 == 1))
                self.trials.append(t)
                try:
                    v = objective(t)
                except TrialPruned:
                    t.state.name = "PRUNED"
                    continue
                t.value = v
                t.state.name = "COMPLETE"
                if self.best_value is None or v < self.best_value:
                    self.best_value = v
                    self.best_params = {"loss__beta": t._beta}

    fake = types.ModuleType("optuna")
    fake.TrialPruned = TrialPruned
    fake.create_study = lambda direction, pruner=None: FakeStudy()
    fake.pruners = types.SimpleNamespace(MedianPruner=lambda: "median")
    monkeypatch.setitem(sys.modules, "optuna", fake)

    calls = []

    def fake_run(cfg):
        calls.append((cfg.is_only_feat, cfg.data_feat.n_epochs))
        return {"test/feat/loss": cfg.loss.beta,
                "val/feat/loss": cfg.loss.beta}

    from lossyless_tpu.pipeline.hypopt import hypopt

    res = hypopt(preset("banana_viz_VIC"),
                 {"loss.beta": ("log_uniform", 1e-3, 1.0)},
                 monitor="val/feat/loss", n_trials=4, run_fn=fake_run,
                 prune=True)
    # every trial ran a rung (is_only_feat, 25 epochs); odd trials pruned
    rungs = [c for c in calls if c[0]]
    fulls = [c for c in calls if not c[0]]
    assert len(rungs) == 4 and all(c[1] == 25 for c in rungs)
    assert len(fulls) == 2                      # trials 0 and 2 survive
    assert res["best"]["value"] is not None
    # result contract matches the built-in searcher (plot_hypopt consumes
    # 'trials'; pruned trials are flagged; dotted param names restored)
    assert len(res["trials"]) == 4
    assert [t["pruned"] for t in res["trials"]] == [False, True, False, True]
    assert "loss.beta" in res["best"]["params"]
    assert res["direction"] == "minimize"


def test_train_step_bench_harness():
    """bin/train_step_bench.py measures a real preset step (CPU, tiny)."""
    import importlib.util
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "tsb", root / "bin" / "train_step_bench.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    rec = m.bench_preset("banana_viz_VIC", batch=32, reps=4)
    assert rec["final_loss_finite"]
    assert rec["ms_per_step"] > 0
    assert rec["precision"] in ("fp32", "bf16")
