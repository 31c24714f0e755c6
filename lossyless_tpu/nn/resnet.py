"""ResNet encoders (18/34/50) with small-image stem surgery.

Flax/NHWC equivalent of `/root/reference/lossyless/architectures.py:235-309`:
torchvision resnets whose first conv is replaced by 3x3/stride-1 and whose
stem max-pool is dropped when the input side is < 100 (CIFAR/MNIST-scale), and
whose final fc maps to `out_dim`.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not training)
        residual = x
        y = nn.Conv(self.filters, (3, 3), self.strides, padding=1, use_bias=False)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False)(y)
        y = norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), self.strides, use_bias=False)(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not training)
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), self.strides, padding=1, use_bias=False)(y)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False)(y)
        y = norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1), self.strides,
                               use_bias=False)(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


STAGES = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (BottleneckBlock, (3, 4, 6, 3)),
}


class ResNet(nn.Module):
    out_dim: int
    in_shape: Sequence[int]  # (H, W, C)
    base: str = "resnet18"
    is_no_linear: bool = False  # return pooled features without the fc head

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        block, stage_sizes = STAGES[self.base]
        small_input = min(self.in_shape[0], self.in_shape[1]) < 100

        if small_input:
            # stem surgery for small images (architectures.py:292-297)
            x = nn.Conv(64, (3, 3), 1, padding=1, use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not training)(x)
            x = nn.relu(x)
        else:
            x = nn.Conv(64, (7, 7), 2, padding=3, use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not training)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i, n_blocks in enumerate(stage_sizes):
            for j in range(n_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                x = block(64 * 2 ** i, strides)(x, training=training)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        if self.is_no_linear:
            return x
        return nn.Dense(self.out_dim)(x)
