"""Mixed-precision (bf16) policy across the architecture zoo.

The reference trains fp16 (`trainer.precision: 16`, config/main.yaml); the
TPU analog is bf16 compute with fp32 params/norm statistics. These tests pin
that `dtype="bfloat16"`:

* keeps the same parameter tree (drop-in for checkpoints/converters),
* produces forwards close to fp32 (bf16 has ~3 decimal digits),
* trains the full compressor to a finite loss through the pipeline config
  surface (`encoder.arch_kwargs.dtype=bfloat16`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("build", ["mlp", "cnn", "balle", "resnet"])
def test_bf16_same_tree_close_forward(build):
    from lossyless_tpu.nn.registry import get_architecture

    rng = np.random.default_rng(0)
    if build == "mlp":
        args = (16, 8)
        kw = dict(hid_dim=32, norm_layer="batchnorm")
        x = rng.normal(size=(4, 16)).astype(np.float32)
    elif build == "cnn":
        args = ((16, 16, 3), 8)
        kw = dict(hid_dim=8)
        x = rng.uniform(size=(4, 16, 16, 3)).astype(np.float32)
    elif build == "balle":
        args = ((16, 16, 3), 32)
        kw = dict(hid_dim=8, n_layers=2)
        x = rng.uniform(size=(4, 16, 16, 3)).astype(np.float32)
    else:
        args = ((16, 16, 3), 8)
        kw = dict()
        x = rng.uniform(size=(4, 16, 16, 3)).astype(np.float32)

    mode = {"mlp": "mlp", "cnn": "cnn", "balle": "balle",
            "resnet": "resnet"}[build]
    m32 = get_architecture(mode, *args, **kw)
    m16 = get_architecture(mode, *args, dtype="bfloat16", **kw)

    v32 = m32.init(jax.random.key(0), jnp.asarray(x), training=False)
    v16 = m16.init(jax.random.key(0), jnp.asarray(x), training=False)

    # identical parameter trees (shapes + names): bf16 is drop-in
    p32 = jax.tree_util.tree_leaves_with_path(v32["params"])
    p16 = dict(jax.tree_util.tree_leaves_with_path(v16["params"]))
    assert len(p32) == len(p16)
    for k, leaf in p32:
        assert tuple(p16[tuple(k)].shape) == tuple(leaf.shape)
        assert p16[tuple(k)].dtype == leaf.dtype  # params stay fp32

    y32 = np.asarray(m32.apply(v32, jnp.asarray(x), training=False))
    y16 = np.asarray(m16.apply(v16, jnp.asarray(x), training=False))
    assert y16.dtype == np.float32  # outputs returned fp32
    scale = max(1.0, float(np.abs(y32).max()))
    assert np.max(np.abs(y32 - y16)) / scale < 0.05


def test_bf16_compressor_trains_through_config(tmp_path):
    from lossyless_tpu.cli import main

    m = main([
        "mnist_vic", "data_feat.n_epochs=1", "data_feat.batch_size=64",
        "encoder.arch=cnn",  # small tower for test speed (preset: resnet18)
        "encoder.arch_kwargs.hid_dim=16",
        "encoder.arch_kwargs.dtype=bfloat16",
        "distortion.arch_kwargs.dtype=bfloat16",
        "data_feat.kwargs.synthetic=True", "data_feat.kwargs.synthetic_n=256",
        "is_only_feat=True", "is_skip_comm=True", "trainer.log_every=0",
        f"out_dir={tmp_path}/r", f"ckpt_dir={tmp_path}/c",
    ])
    assert np.isfinite(m["test/feat/loss"])
    assert np.isfinite(m["test/feat/rate"])


def test_trainer_precision_flag(tmp_path):
    """trainer.precision=bf16 injects dtype into encoder+decoder kwargs
    (reference trainer.precision: 16); explicit arch_kwargs.dtype wins."""
    from lossyless_tpu.pipeline.config import (apply_overrides,
                                               apply_precision, preset)

    cfg = apply_overrides(preset("mnist_vic"), ["trainer.precision=bf16"])
    cfg = apply_precision(cfg)
    assert cfg.encoder.arch_kwargs["dtype"] == "bfloat16"
    assert cfg.distortion.arch_kwargs["dtype"] == "bfloat16"
    # idempotent + explicit dtype respected
    cfg2 = apply_overrides(preset("mnist_vic"), [
        "trainer.precision=bf16", "encoder.arch_kwargs.dtype='float32'"])
    cfg2 = apply_precision(apply_precision(cfg2))
    assert cfg2.encoder.arch_kwargs["dtype"] == "float32"

    import pytest as _pytest

    bad = apply_overrides(preset("mnist_vic"), ["trainer.precision=fp16"])
    with _pytest.raises(ValueError, match="precision"):
        apply_precision(bad)

    # e2e through the pipeline
    from lossyless_tpu.cli import main

    m = main([
        "mnist_vic", "data_feat.n_epochs=1", "data_feat.batch_size=64",
        "encoder.arch=cnn",  # small tower for test speed (preset: resnet18)
        "encoder.arch_kwargs.hid_dim=16",
        "trainer.precision=bf16",
        "data_feat.kwargs.synthetic=True", "data_feat.kwargs.synthetic_n=256",
        "is_only_feat=True", "is_skip_comm=True", "trainer.log_every=0",
        f"out_dir={tmp_path}/r", f"ckpt_dir={tmp_path}/c",
    ])
    assert np.isfinite(m["test/feat/loss"])


def test_preset_precision_default():
    """Non-banana presets default to bf16 like the reference's
    trainer.precision: 16 (config/main.yaml:124); banana scripts pin 32
    (bin/banana/*.sh); dotted overrides still win."""
    from lossyless_tpu.pipeline.config import (apply_overrides,
                                               available_presets, preset)

    for name in available_presets():
        cfg = preset(name)
        want = "fp32" if cfg.experiment.startswith("banana") else "bf16"
        assert cfg.trainer.precision == want, (name, cfg.trainer.precision)

    cfg = apply_overrides(preset("mnist_vic"), ["trainer.precision=fp32"])
    assert cfg.trainer.precision == "fp32"
