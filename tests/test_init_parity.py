"""Reference weight-init parity (helpers.py:153-192 `weights_init`).

The reference initializes every Linear with kaiming_uniform over fan_in
(relu gain: bound = sqrt(6/fan_in)) and every Conv with kaiming_normal over
fan_out (std = sqrt(2/fan_out)), zeroing biases. These tests pin that the
trained-from-scratch architectures draw from those distributions (flax's
default lecun_normal would halve the weight variance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _init(module, x_shape):
    return module.init(jax.random.key(0), jnp.zeros(x_shape), training=False)


def test_mlp_dense_kaiming_uniform():
    from lossyless_tpu.nn.mlp import MLP

    v = _init(MLP(out_dim=64, hid_dim=256, n_hid_layers=2), (2, 128))
    k = np.asarray(v["params"]["Dense_0"]["kernel"])  # (128, 256)
    fan_in = k.shape[0]
    bound = np.sqrt(6.0 / fan_in)
    assert np.abs(k).max() <= bound + 1e-6
    # a uniform(-b, b) draw has var b^2/3 = 2/fan_in and fills the range
    assert np.abs(k).max() > 0.9 * bound
    assert np.isclose(k.var(), 2.0 / fan_in, rtol=0.15)
    assert np.all(np.asarray(v["params"]["Dense_0"]["bias"]) == 0.0)


def test_cnn_conv_kaiming_normal_fan_out():
    from lossyless_tpu.nn.cnn import CNNEncoder

    v = _init(CNNEncoder(out_dim=16, in_shape=(32, 32, 3), hid_dim=32),
              (2, 32, 32, 3))
    k = np.asarray(v["params"]["Conv_0"]["kernel"])  # (3, 3, 3, 32)
    fan_out = k.shape[0] * k.shape[1] * k.shape[-1]
    assert np.isclose(k.std(), np.sqrt(2.0 / fan_out), rtol=0.2)


def test_balle_conv_kaiming():
    from lossyless_tpu.nn.cnn import BalleEncoder

    v = _init(BalleEncoder(out_dim=64, in_shape=(32, 32, 3), hid_dim=64,
                           n_layers=4), (2, 32, 32, 3))
    k = np.asarray(v["params"]["Conv_0"]["kernel"])  # (5, 5, 3, 64)
    fan_out = k.shape[0] * k.shape[1] * k.shape[-1]
    assert np.isclose(k.std(), np.sqrt(2.0 / fan_out), rtol=0.2)


def test_resnet_conv_kaiming():
    from lossyless_tpu.nn.resnet import ResNet

    v = _init(ResNet(out_dim=16, in_shape=(32, 32, 3), base="resnet18"),
              (2, 32, 32, 3))
    k = np.asarray(v["params"]["Conv_0"]["kernel"])  # 3x3 stem (small input)
    fan_out = k.shape[0] * k.shape[1] * k.shape[-1]
    assert np.isclose(k.std(), np.sqrt(2.0 / fan_out), rtol=0.2)


@pytest.mark.parametrize("fan_in", [64, 512])
def test_initializer_formulas(fan_in):
    from lossyless_tpu.nn.layers import KAIMING_NORMAL_OUT, KAIMING_UNIFORM

    k = KAIMING_UNIFORM(jax.random.key(1), (fan_in, 4096), jnp.float32)
    assert float(jnp.abs(k).max()) <= np.sqrt(6.0 / fan_in) + 1e-6
    assert np.isclose(float(k.var()), 2.0 / fan_in, rtol=0.1)

    k = KAIMING_NORMAL_OUT(jax.random.key(2), (3, 3, 8, fan_in), jnp.float32)
    assert np.isclose(float(k.std()), np.sqrt(2.0 / (9 * fan_in)), rtol=0.1)
