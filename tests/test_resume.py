"""Preemption-safe mid-stage resume (SURVEY.md §5.3)."""

from pathlib import Path

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_featurizer_resumes_from_last_checkpoint(tmp_path):
    """Interrupt after epoch 1, rerun with more epochs: training continues
    from the last checkpoint instead of restarting (main.py:465-468)."""
    from lossyless_tpu.pipeline.config import apply_overrides, preset
    from lossyless_tpu.pipeline.run import run_featurizer
    from lossyless_tpu.train.checkpoints import stage_sentinel

    base = [
        "data_feat.kwargs.length=2048", "data_feat.batch_size=256",
        "data_feat.val_batch_size=512",
        "encoder.arch_kwargs={'hid_dim':32,'n_hid_layers':1}",
        "distortion.arch_kwargs={'hid_dim':32,'n_hid_layers':1}",
        "online.arch_kwargs={'hid_dim':16}",
        f"out_dir={tmp_path}/results", f"ckpt_dir={tmp_path}/ckpt",
    ]
    # "preempted" run: 1 epoch only
    cfg1 = apply_overrides(preset("banana_viz_VIC"),
                           base + ["data_feat.n_epochs=1"])
    _, state1, *_ = run_featurizer(cfg1)
    step_after_1 = int(state1.step)
    assert step_after_1 > 0

    # restart with 3 epochs, same checkpoint dir: must resume, not restart.
    # (remove the stage sentinel like a preemption before stage completion)
    stage_sentinel(cfg1.stage_dir, "featurizer").unlink()
    cfg2 = apply_overrides(preset("banana_viz_VIC"),
                           base + ["data_feat.n_epochs=3"])
    _, state2, *_ = run_featurizer(cfg2)
    # resumed: exactly 2 more epochs of steps, not 3 fresh ones
    assert int(state2.step) == 3 * step_after_1
    # DISCRIMINATING check (a from-scratch 3-epoch run would also end at
    # 3*step_after_1): the resumed run executed only 2 epochs, so the
    # shared metrics CSV holds 1 (run 1) + 2 (run 2) validation rows —
    # a restart-from-scratch would leave 1 + 3
    import csv

    with (Path(cfg2.stage_dir) / "train_featurizer.csv").open() as f:
        rows = list(csv.DictReader(f))
    val_rows = [r for r in rows if r.get("val/feat/loss")]
    assert len(val_rows) == 3, \
        f"expected 1+2 validation rows (resume), got {len(val_rows)}"


def test_label_equivalence_in_image_pipeline():
    from lossyless_tpu.data.images import ImageDataset

    ds = ImageDataset(
        name="cifar10", synthetic=True, synthetic_n=128,
        equivalence=("hflip",),
        label_equivalence=dict(invariant_scale=(0.99, 1.0),
                               equivariant_scale=(0.2, 1.0), p=1.0),
    )
    x, y, aux = next(ds.batches(64, seed=0, shuffle=False))
    assert x.shape == (64, 32, 32, 3)
    # nearly all crops land in the (huge) equivariant range with p=1, so a
    # large fraction of labels must differ from the raw dataset labels
    raw_y = ds.targets[:64]
    frac_changed = float((np.asarray(y) != raw_y).mean())
    assert frac_changed > 0.5


@pytest.mark.slow
def test_weights_export_preserves_batch_stats(tmp_path):
    """BN running stats survive the weights-only export.

    The reference's weights-only export is a torch state_dict, which
    includes BatchNorm buffers (main.py:516-528); the orbax export must
    carry them too, or a sentinel-resumed run would evaluate CNN/ResNet
    models with freshly initialized statistics.
    """
    from pathlib import Path

    from lossyless_tpu.compressors.compressor import LearnableCompressor
    from lossyless_tpu.pipeline.config import apply_overrides, preset
    from lossyless_tpu.pipeline.run import run_featurizer
    from lossyless_tpu.train.checkpoints import load_state_weights
    from lossyless_tpu.train.state import OptimConfig, TrainState

    cfg = apply_overrides(preset("mnist_vic"), [
        "data_feat.kwargs={'additional_target':'representative',"
        "'synthetic':True,'synthetic_n':512}",
        "data_feat.n_epochs=1", "data_feat.batch_size=128",
        "data_feat.val_batch_size=128",
        # CNN encoder for test speed (preset default is resnet18); still
        # carries BatchNorm batch_stats, which is what this test pins
        "encoder.arch=cnn",
        "encoder.arch_kwargs={'hid_dim':16}",
        "distortion.arch_kwargs={'hid_dim':16}",
        "online.arch_kwargs={'hid_dim':16}",
        "trainer.log_every=0",
        f"out_dir={tmp_path}/results", f"ckpt_dir={tmp_path}/ckpt",
    ])
    model, state, train_ds, *_ = run_featurizer(cfg)
    trained_bs = jax.device_get(state.batch_stats)
    assert trained_bs, "mnist_vic CNN must carry BatchNorm batch_stats"

    # the sentinel-resume rebuild: fresh init + load_state_weights
    sample = next(train_ds.batches(128, seed=0))
    model2 = LearnableCompressor(cfg.compressor_config())
    state2 = TrainState.create(model2, sample, jax.random.key(7),
                               main=OptimConfig())
    params, bstats = load_state_weights(
        Path(cfg.ckpt_dir) / cfg.long_name / "best_featurizer",
        jax.device_get(state2.params), jax.device_get(state2.batch_stats))
    flat_want = jax.tree_util.tree_leaves_with_path(trained_bs)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(bstats))
    assert flat_want
    for k, v in flat_want:
        np.testing.assert_array_equal(np.asarray(flat_got[k]),
                                      np.asarray(v))


class TestSwapCrashWindows:
    """Every preemption window of the tmp/old two-rename checkpoint swap
    must still resolve to a complete checkpoint (regression: restore()/
    has_last consulted only `path`, so a crash between the two renames
    silently restarted the stage from step 0)."""

    @pytest.fixture
    def mgr_and_state(self, tmp_path):
        from lossyless_tpu.train.checkpoints import CheckpointManager

        state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                 "b": np.float32(7.0)}
        mgr = CheckpointManager(tmp_path / "ckpt")
        mgr.save_last(state, step=3)
        return mgr, state

    def _target(self, state):
        return jax.tree.map(np.zeros_like, state)

    def test_mid_swap_window_resolves_to_tmp(self, mgr_and_state):
        """No `last`, complete `last.tmp` + `last.old`: the window between
        `path.rename(old)` and `tmp.rename(path)`."""
        import shutil

        mgr, state = mgr_and_state
        last = mgr.dir / "last"
        shutil.copytree(last, mgr.dir / "last.tmp")
        last.rename(mgr.dir / "last.old")

        assert mgr.has_last
        got = mgr.restore(self._target(state))
        np.testing.assert_array_equal(got["w"], state["w"])

    def test_old_alone_resolves(self, mgr_and_state):
        mgr, state = mgr_and_state
        (mgr.dir / "last").rename(mgr.dir / "last.old")
        assert mgr.has_last
        got = mgr.restore(self._target(state))
        np.testing.assert_array_equal(got["w"], state["w"])

    def test_bare_tmp_is_not_a_checkpoint(self, tmp_path):
        """A `.tmp` with no `path` and no `.old` is a first-ever save that
        died mid-write — incomplete by construction, never resolved."""
        from lossyless_tpu.train.checkpoints import CheckpointManager

        mgr = CheckpointManager(tmp_path / "ckpt")
        (mgr.dir / "last.tmp").mkdir()
        assert not mgr.has_last
        assert mgr.restore({"w": np.zeros(2)}) is None

    def test_save_weights_never_deletes_before_swap(self, tmp_path):
        """save_weights keeps a complete export through its whole swap:
        simulate its mid-swap window and load through it."""
        import shutil

        from lossyless_tpu.train.checkpoints import (load_state_weights,
                                                     save_weights)

        params = {"dense": {"kernel": np.ones((3, 2), np.float32)}}
        path = tmp_path / "best_featurizer"
        save_weights(path, params)
        shutil.copytree(path, tmp_path / "best_featurizer.tmp")
        path.rename(tmp_path / "best_featurizer.old")

        got, _ = load_state_weights(path, jax.tree.map(np.zeros_like, params))
        np.testing.assert_array_equal(got["dense"]["kernel"],
                                      params["dense"]["kernel"])


class TestSwapHealing:
    """resolve_swap finishes an interrupted swap on first touch, so window
    states cannot compound across repeated preemptions."""

    def _mgr(self, tmp_path):
        from lossyless_tpu.train.checkpoints import CheckpointManager

        state = {"w": np.arange(4, dtype=np.float32)}
        mgr = CheckpointManager(tmp_path / "ckpt")
        mgr.save_last(state, step=1)
        return mgr, state

    def test_mid_swap_window_is_healed(self, tmp_path):
        import shutil

        mgr, state = self._mgr(tmp_path)
        last = mgr.dir / "last"
        shutil.copytree(last, mgr.dir / "last.tmp")
        last.rename(mgr.dir / "last.old")

        assert mgr.has_last  # first touch heals
        assert (mgr.dir / "last").exists()
        assert not (mgr.dir / "last.tmp").exists()
        assert not (mgr.dir / "last.old").exists()
        got = mgr.restore(jax.tree.map(np.zeros_like, state))
        np.testing.assert_array_equal(got["w"], state["w"])

    def test_partial_tmp_with_old_falls_back_to_old(self, tmp_path):
        """Second-preemption shape: complete .old + PARTIAL .tmp + no path.
        The incomplete tmp must not shadow the complete old."""
        mgr, state = self._mgr(tmp_path)
        (mgr.dir / "last").rename(mgr.dir / "last.old")
        (mgr.dir / "last.tmp").mkdir()  # partial: no orbax metadata

        got = mgr.restore(jax.tree.map(np.zeros_like, state))
        np.testing.assert_array_equal(got["w"], state["w"])
        assert (mgr.dir / "last").exists()
        assert not (mgr.dir / "last.tmp").exists()

    def test_save_heals_pending_window_first(self, tmp_path):
        """_atomic_save on a window state must not destroy the newest
        complete checkpoint (it heals, then swaps normally)."""
        import shutil

        mgr, state = self._mgr(tmp_path)
        last = mgr.dir / "last"
        shutil.copytree(last, mgr.dir / "last.tmp")
        last.rename(mgr.dir / "last.old")

        state2 = {"w": np.full(4, 9.0, np.float32)}
        mgr.save_last(state2, step=2)
        got = mgr.restore(jax.tree.map(np.zeros_like, state2))
        np.testing.assert_array_equal(got["w"], state2["w"])
