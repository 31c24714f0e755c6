"""Architecture registry.

Equivalent of the reference's `get_Architecture`
(`/root/reference/lossyless/architectures.py:42-88`): maps a mode string +
kwargs to a constructor taking (in_shape, out_shape).

Shapes are channels-last: image shapes are (H, W, C).
Encoders map in_shape -> out_dim vectors; decoders (when out_shape is a
tuple) transpose the architecture, as in the reference CNN/BALLE.
"""

from __future__ import annotations

from typing import Any, Sequence

from .clip_resnet import ClipResNet
from .cnn import BalleDecoder, BalleEncoder, CNNDecoder, CNNEncoder
from .mlp import FlattenLinear, FlattenMLP, Identity
from .resnet import ResNet
from .vit import VisionTransformer


def get_architecture(mode: str, in_shape, out_shape, **kwargs):
    """Instantiate an architecture module.

    `in_shape`: int or tuple (H,W,C); `out_shape`: int or tuple (H,W,C).
    A tuple `out_shape` with int `in_shape` selects the transposed variant.
    """
    is_transpose = isinstance(in_shape, int) and not isinstance(out_shape, int)

    if mode == "mlp":
        return FlattenMLP(out_shape=out_shape, **kwargs)
    if mode == "linear":
        return FlattenLinear(out_shape=out_shape, **kwargs)
    if mode == "identity":
        return Identity()
    if mode == "cnn":
        if is_transpose:
            return CNNDecoder(out_shape=tuple(out_shape), **kwargs)
        return CNNEncoder(out_dim=out_shape, in_shape=tuple(in_shape), **kwargs)
    if mode == "balle":
        if is_transpose:
            return BalleDecoder(out_shape=tuple(out_shape), in_dim=in_shape,
                                **kwargs)
        return BalleEncoder(out_dim=out_shape, in_shape=tuple(in_shape), **kwargs)
    if mode == "resnet":
        return ResNet(out_dim=out_shape, in_shape=tuple(in_shape), **kwargs)
    if mode in ("clip", "clip_vit"):
        # plumb the requested output dim and the dataset's resolution: the
        # tower patchifies natively at any square size (pos-embedding sized
        # accordingly); weight conversion requires the canonical 224
        if is_transpose or isinstance(in_shape, int):
            raise ValueError("clip tower is an encoder (image -> vector)")
        h, w, _ = in_shape
        if h != w:
            raise ValueError(f"clip tower needs square inputs, got {h}x{w}")
        kwargs.setdefault("image_size", h)
        return VisionTransformer(out_dim=out_shape, **kwargs)
    if mode == "clip_rn50":
        # OpenAI CLIP's ModifiedResNet-50 (architectures.py:356-376 keeps
        # clip.load("RN50").visual; out_dim asserted 1024 at :340): 3-conv
        # stem, avg-pool anti-aliased downsampling, AttentionPool2d head
        return ClipResNet(out_dim=out_shape, **kwargs)
    if mode in ("simclr", "swav"):
        # pretrained-SSL towers (architectures.py:312-379): torchvision
        # ResNet-50 backbone; converted public weights load into the same
        # param tree when available (this environment has no egress)
        return ResNet(out_dim=out_shape, in_shape=tuple(in_shape),
                      base="resnet50", **kwargs)
    raise ValueError(f"unknown architecture mode={mode}")
