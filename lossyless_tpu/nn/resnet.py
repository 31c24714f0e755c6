"""ResNet encoders (18/34/50) with small-image stem surgery.

Flax/NHWC equivalent of `/root/reference/lossyless/architectures.py:235-309`:
torchvision resnets whose first conv is replaced by 3x3/stride-1 and whose
stem max-pool is dropped when the input side is < 100 (CIFAR/MNIST-scale), and
whose final fc maps to `out_dim`.

Mixed precision: `dtype="bfloat16"` runs convs/matmuls in bf16 on the MXU
(the TPU analog of the reference's fp16 `trainer.precision: 16`); params and
BatchNorm statistics stay fp32 (inputs auto-promote through the fp32 norm
params), so updates are full-precision.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import BN_MOMENTUM, KAIMING_NORMAL_OUT


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        d = jnp.dtype(self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=d,
                       kernel_init=KAIMING_NORMAL_OUT)
        norm = partial(nn.BatchNorm, use_running_average=not training, momentum=BN_MOMENTUM)
        residual = x
        y = conv(self.filters, (3, 3), self.strides, padding=1)(x)
        y = norm()(y)
        y = nn.relu(y).astype(d)
        y = conv(self.filters, (3, 3), padding=1)(y)
        # reference parity: torchvision's default zero_init_residual=False
        # (all BN gammas init to 1; the reference constructs resnet18/50
        # with defaults, architectures.py:240-260)
        y = norm()(y)
        if residual.shape[-1] != y.shape[-1] or self.strides != 1:
            residual = conv(self.filters, (1, 1), self.strides)(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        d = jnp.dtype(self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=d,
                       kernel_init=KAIMING_NORMAL_OUT)
        norm = partial(nn.BatchNorm, use_running_average=not training, momentum=BN_MOMENTUM)
        residual = x
        y = conv(self.filters, (1, 1))(x)
        y = norm()(y)
        y = nn.relu(y).astype(d)
        y = conv(self.filters, (3, 3), self.strides, padding=1)(y)
        y = norm()(y)
        y = nn.relu(y).astype(d)
        y = conv(self.filters * 4, (1, 1))(y)
        # reference parity: torchvision's default zero_init_residual=False
        # (all BN gammas init to 1; the reference constructs resnet18/50
        # with defaults, architectures.py:240-260)
        y = norm()(y)
        if residual.shape[-1] != y.shape[-1] or self.strides != 1:
            residual = conv(self.filters * 4, (1, 1), self.strides)(x)
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
    dtype: str = "float32"      # "bfloat16" = MXU mixed precision

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        d = jnp.dtype(self.dtype)
        block, stage_sizes = STAGES[self.base]
        small_input = min(self.in_shape[0], self.in_shape[1]) < 100

        x = x.astype(d)
        if small_input:
            # stem surgery for small images (architectures.py:292-297)
            x = nn.Conv(64, (3, 3), 1, padding=1, use_bias=False, dtype=d,
                        kernel_init=KAIMING_NORMAL_OUT)(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=BN_MOMENTUM)(x)
            x = nn.relu(x)
        else:
            x = nn.Conv(64, (7, 7), 2, padding=3, use_bias=False, dtype=d,
                        kernel_init=KAIMING_NORMAL_OUT)(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=BN_MOMENTUM)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = x.astype(d)

        for i, n_blocks in enumerate(stage_sizes):
            for j in range(n_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                x = block(64 * 2 ** i, strides, self.dtype)(
                    x, training=training).astype(d)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # fp32 pool
        if self.is_no_linear:
            return x
        return nn.Dense(self.out_dim)(x)
