"""torchvision-layout ResNet-50 weight conversion into the flax tower."""

import jax
import jax.numpy as jnp
import numpy as np

from lossyless_tpu.nn.convert_resnet import (convert_torchvision_resnet,
                                             load_into)
from lossyless_tpu.nn.resnet import ResNet


def fake_torchvision_resnet50_sd():
    """Minimal fake state dict with torchvision resnet50 names/shapes."""
    sd = {}

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = np.zeros((cout, cin, k, k), np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)
        sd[f"{name}.running_mean"] = np.zeros((c,), np.float32)
        sd[f"{name}.running_var"] = np.ones((c,), np.float32)

    conv("conv1", 3, 64, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    stages = [3, 4, 6, 3]
    cin = 64
    for s, (w, n) in enumerate(zip(widths, stages), start=1):
        for j in range(n):
            p = f"layer{s}.{j}"
            conv(f"{p}.conv1", cin if j == 0 else w * 4, w, 1)
            bn(f"{p}.bn1", w)
            conv(f"{p}.conv2", w, w, 3)
            bn(f"{p}.bn2", w)
            conv(f"{p}.conv3", w, w * 4, 1)
            bn(f"{p}.bn3", w * 4)
            if j == 0:
                conv(f"{p}.downsample.0", cin, w * 4, 1)
                bn(f"{p}.downsample.1", w * 4)
        cin = w * 4
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    return sd


def test_converted_tree_matches_flax_resnet50():
    m = ResNet(out_dim=128, in_shape=(224, 224, 3), base="resnet50")
    variables = m.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
                       training=False)
    cp, cs = convert_torchvision_resnet(fake_torchvision_resnet50_sd())

    ref_shapes = jax.tree.map(lambda a: a.shape, variables["params"])
    for key, sub in cp.items():
        assert key in ref_shapes, key
        conv_shapes = jax.tree.map(lambda a: a.shape, sub)
        flat_ref = dict(jax.tree_util.tree_flatten_with_path(
            ref_shapes[key])[0])
        flat_conv = dict(jax.tree_util.tree_flatten_with_path(conv_shapes)[0])
        assert flat_conv.keys() <= flat_ref.keys(), key
        for k in flat_conv:
            assert flat_conv[k] == flat_ref[k], (key, k)

    # merged variables actually run a forward pass
    merged = load_into(variables, cp, cs)
    z = m.apply(merged, jnp.zeros((1, 224, 224, 3)), training=False)
    assert z.shape == (1, 128)
    # head stayed randomly initialized (converter skipped fc)
    assert "Dense_0" in merged["params"]
