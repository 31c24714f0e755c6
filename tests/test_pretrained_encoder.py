"""Pretrained tower weights reaching the TRAINING pipeline.

VERDICT r2 gap #2: the converters existed but no config path could inject
pretrained weights into training — `clip_lossyZ`-style presets silently
trained a random tower. These tests pin `encoder.pretrained_path`:

* a torch-layout CLIP state dict (tiny config, random values) loads through
  `convert_openai_clip_weights` into the train state,
* composed with `frozen=("p_ZlX",)` the tower is bit-identical after
  training (the reference's PretrainedSSL + Freezer semantics,
  architectures.py:356-376),
* .npz round-trip and shape-mismatch errors.
"""

import dataclasses

import jax
import numpy as np
import pytest


W, LAYERS, HEADS, PATCH, OUT = 32, 2, 2, 8, 16
N_TOKENS = (32 // PATCH) ** 2 + 1


def tiny_clip_state_dict(seed=0):
    """Random state dict with OpenAI CLIP's visual-tower layout/naming."""
    g = np.random.default_rng(seed)

    def r(*shape):
        return g.normal(size=shape).astype(np.float32) * 0.05

    sd = {
        "conv1.weight": r(W, 3, PATCH, PATCH),           # torch OIHW
        "class_embedding": r(W),
        "positional_embedding": r(N_TOKENS, W),
        "ln_pre.weight": r(W) + 1, "ln_pre.bias": r(W),
        "ln_post.weight": r(W) + 1, "ln_post.bias": r(W),
        "proj": r(W, OUT),
    }
    for i in range(LAYERS):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = r(W) + 1
        sd[f"{p}.ln_1.bias"] = r(W)
        sd[f"{p}.ln_2.weight"] = r(W) + 1
        sd[f"{p}.ln_2.bias"] = r(W)
        sd[f"{p}.attn.in_proj_weight"] = r(3 * W, W)
        sd[f"{p}.attn.in_proj_bias"] = r(3 * W)
        sd[f"{p}.attn.out_proj.weight"] = r(W, W)
        sd[f"{p}.attn.out_proj.bias"] = r(W)
        sd[f"{p}.mlp.c_fc.weight"] = r(4 * W, W)
        sd[f"{p}.mlp.c_fc.bias"] = r(4 * W)
        sd[f"{p}.mlp.c_proj.weight"] = r(W, 4 * W)
        sd[f"{p}.mlp.c_proj.bias"] = r(W)
    return sd


def _tiny_clip_cfg():
    from lossyless_tpu.pipeline.config import (DataConfig, ExperimentConfig,
                                               OptimConfig, preset)
    from lossyless_tpu.compressors.compressor import (EncoderConfig,
                                                      LossConfig,
                                                      OnlineEvalConfig)
    from lossyless_tpu.compressors.distortions import DistortionConfig
    from lossyless_tpu.compressors.rates import RateConfig

    return ExperimentConfig(
        experiment="tiny_clip_pretrained",
        is_only_feat=True,
        data_feat=DataConfig(name="cifar10", batch_size=64, n_epochs=1,
                             kwargs=dict(additional_target="target",
                                         synthetic=True, synthetic_n=256)),
        encoder=EncoderConfig(
            arch="clip", z_dim=OUT,
            arch_kwargs=dict(width=W, layers=LAYERS, heads=HEADS,
                             patch_size=PATCH),
        ),
        rate=RateConfig(mode="H_factorized", is_endToEnd=False),
        distortion=DistortionConfig(mode="lossy_Z"),
        online=OnlineEvalConfig(is_online=False),
        loss=LossConfig(beta=0.05, beta_anneal="constant"),
        frozen=("p_ZlX",),
    )


def _save_pt(tmp_path, sd, name="tower.pt"):
    torch = pytest.importorskip("torch")
    path = tmp_path / name
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    return path


def test_loader_injects_converted_weights(tmp_path):
    from lossyless_tpu.nn.pretrained import load_pretrained_encoder
    from lossyless_tpu.nn.vit import convert_openai_clip_weights
    from lossyless_tpu.compressors.compressor import LearnableCompressor
    from lossyless_tpu.train.state import OptimConfig, TrainState

    cfg = _tiny_clip_cfg()
    cfg.in_shape, cfg.target_shape, cfg.aux_shape = (32, 32, 3), 10, (OUT,)
    model = LearnableCompressor(cfg.compressor_config())
    g = np.random.default_rng(1)
    batch = (g.normal(size=(4, 32, 32, 3)).astype(np.float32),
             np.zeros((4,), np.int32),
             g.normal(size=(4, OUT)).astype(np.float32))
    state = TrainState.create(model, batch, jax.random.key(0),
                              main=OptimConfig(lr=1e-3))

    sd = tiny_clip_state_dict()
    path = _save_pt(tmp_path, sd)
    enc = dataclasses.replace(cfg.encoder, pretrained_path=str(path))
    params, _ = load_pretrained_encoder(enc, jax.device_get(state.params),
                                        jax.device_get(state.batch_stats))

    want = convert_openai_clip_weights(sd)
    got = params["p_ZlX"]["mapper"]
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(got))
    assert len(flat_w) > 10
    for k, v in flat_w:
        np.testing.assert_array_equal(np.asarray(flat_g[tuple(k)]),
                                      np.asarray(v))


@pytest.mark.slow
def test_pipeline_trains_frozen_pretrained_tower(tmp_path):
    """clip-lossyZ-style run: pretrained tower injected AND frozen."""
    from lossyless_tpu.nn.vit import convert_openai_clip_weights
    from lossyless_tpu.pipeline import run as runlib
    from lossyless_tpu.train.checkpoints import load_weights

    sd = tiny_clip_state_dict()
    path = _save_pt(tmp_path, sd)

    cfg = _tiny_clip_cfg()
    cfg.encoder = dataclasses.replace(cfg.encoder,
                                      pretrained_path=str(path))
    cfg.out_dir = str(tmp_path / "results")
    cfg.ckpt_dir = str(tmp_path / "ckpt")
    metrics = runlib.main(cfg)
    assert np.isfinite(metrics["test/feat/loss"])

    # the exported best featurizer's tower == the converted weights,
    # bit-exact (frozen => zero updates, Freezer semantics)
    from pathlib import Path

    import orbax.checkpoint as ocp

    want = convert_openai_clip_weights(sd)
    exported = ocp.StandardCheckpointer().restore(
        (Path(cfg.ckpt_dir) / cfg.long_name / "best_featurizer").absolute())
    got = exported["p_ZlX"]["mapper"]
    for k, v in jax.tree_util.tree_leaves_with_path(want):
        got_leaf = got
        for part in k:
            got_leaf = got_leaf[part.key]
        np.testing.assert_array_equal(np.asarray(got_leaf), np.asarray(v))


def test_npz_roundtrip_and_shape_mismatch(tmp_path):
    from lossyless_tpu.nn.pretrained import (_flatten, load_pretrained_encoder)
    from lossyless_tpu.nn.vit import convert_openai_clip_weights
    from lossyless_tpu.compressors.compressor import LearnableCompressor
    from lossyless_tpu.train.state import OptimConfig, TrainState

    cfg = _tiny_clip_cfg()
    cfg.in_shape, cfg.target_shape, cfg.aux_shape = (32, 32, 3), 10, (OUT,)
    model = LearnableCompressor(cfg.compressor_config())
    g = np.random.default_rng(1)
    batch = (g.normal(size=(4, 32, 32, 3)).astype(np.float32),
             np.zeros((4,), np.int32),
             g.normal(size=(4, OUT)).astype(np.float32))
    state = TrainState.create(model, batch, jax.random.key(0),
                              main=OptimConfig(lr=1e-3))
    host_params = jax.device_get(state.params)
    host_stats = jax.device_get(state.batch_stats)

    want = convert_openai_clip_weights(tiny_clip_state_dict())
    npz = tmp_path / "tower.npz"
    np.savez(npz, **_flatten(jax.tree.map(np.asarray, want)))
    enc = dataclasses.replace(cfg.encoder, pretrained_path=str(npz))
    params, _ = load_pretrained_encoder(enc, host_params, host_stats)
    np.testing.assert_array_equal(
        np.asarray(params["p_ZlX"]["mapper"]["proj"]), want["proj"])

    # wrong width -> clear shape error
    bad = dict(want)
    bad["proj"] = np.zeros((W + 1, OUT), np.float32)
    npz_bad = tmp_path / "bad.npz"
    np.savez(npz_bad, **_flatten(bad))
    enc_bad = dataclasses.replace(cfg.encoder, pretrained_path=str(npz_bad))
    with pytest.raises(ValueError, match="proj"):
        load_pretrained_encoder(enc_bad, host_params, host_stats)

    enc_missing = dataclasses.replace(cfg.encoder,
                                      pretrained_path=str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        load_pretrained_encoder(enc_missing, host_params, host_stats)


def _tiny_cnn_cfg():
    cfg = _tiny_clip_cfg()
    from lossyless_tpu.compressors.compressor import EncoderConfig

    cfg.encoder = EncoderConfig(arch="cnn", z_dim=OUT,
                                arch_kwargs=dict(hid_dim=16))
    cfg.in_shape, cfg.target_shape, cfg.aux_shape = (32, 32, 3), 10, (OUT,)
    return cfg


def _cnn_state(cfg):
    from lossyless_tpu.compressors.compressor import LearnableCompressor
    from lossyless_tpu.train.state import OptimConfig, TrainState

    model = LearnableCompressor(cfg.compressor_config())
    g = np.random.default_rng(1)
    batch = (g.normal(size=(4, 32, 32, 3)).astype(np.float32),
             np.zeros((4,), np.int32),
             g.normal(size=(4, OUT)).astype(np.float32))
    return TrainState.create(model, batch, jax.random.key(0),
                             main=OptimConfig(lr=1e-3))


def test_npz_and_orbax_batch_stats_roundtrip(tmp_path):
    """BN towers: batch_stats ride in npz (batch_stats/ prefix) and in the
    combined orbax export; a stats-less file warns instead of silently
    leaving init statistics."""
    from lossyless_tpu.nn.pretrained import _flatten, load_pretrained_encoder
    from lossyless_tpu.train.checkpoints import save_weights

    cfg = _tiny_cnn_cfg()
    state = _cnn_state(cfg)
    host_p = jax.device_get(state.params)["p_ZlX"]["mapper"]
    host_s = jax.device_get(state.batch_stats)["p_ZlX"]["mapper"]
    assert host_s, "cnn tower must carry BN batch_stats"
    want_p = jax.tree.map(lambda a: a + 1.0, host_p)
    want_s = jax.tree.map(lambda a: a + 2.0, host_s)

    def check(loaded_params, loaded_stats):
        got_p = loaded_params["p_ZlX"]["mapper"]
        got_s = loaded_stats["p_ZlX"]["mapper"]
        for (k, v), (_, g) in zip(
                jax.tree_util.tree_leaves_with_path(want_p),
                jax.tree_util.tree_leaves_with_path(got_p)):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(v))
        for (k, v), (_, g) in zip(
                jax.tree_util.tree_leaves_with_path(want_s),
                jax.tree_util.tree_leaves_with_path(got_s)):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(v))

    # npz with params/ + batch_stats/ prefixes
    flat = {f"params/{k}": v for k, v in _flatten(want_p).items()}
    flat.update({f"batch_stats/{k}": v
                 for k, v in _flatten(want_s).items()})
    np.savez(tmp_path / "tower.npz", **flat)
    enc = dataclasses.replace(cfg.encoder,
                              pretrained_path=str(tmp_path / "tower.npz"))
    check(*load_pretrained_encoder(enc, jax.device_get(state.params),
                                   jax.device_get(state.batch_stats)))

    # combined orbax export
    save_weights(tmp_path / "tower_orbax", want_p, want_s)
    enc = dataclasses.replace(cfg.encoder,
                              pretrained_path=str(tmp_path / "tower_orbax"))
    check(*load_pretrained_encoder(enc, jax.device_get(state.params),
                                   jax.device_get(state.batch_stats)))

    # stats-less npz: loads params but warns about init BN statistics
    np.savez(tmp_path / "bare.npz", **_flatten(want_p))
    enc = dataclasses.replace(cfg.encoder,
                              pretrained_path=str(tmp_path / "bare.npz"))
    with pytest.warns(UserWarning, match="BatchNorm"):
        params, stats = load_pretrained_encoder(
            enc, jax.device_get(state.params),
            jax.device_get(state.batch_stats))
    got_p = params["p_ZlX"]["mapper"]
    for (k, v), (_, g) in zip(jax.tree_util.tree_leaves_with_path(want_p),
                              jax.tree_util.tree_leaves_with_path(got_p)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(v))
