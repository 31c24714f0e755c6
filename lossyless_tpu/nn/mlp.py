"""MLP family: MLP / FlattenMLP / FlattenLinear.

Flax equivalents of `/root/reference/lossyless/architectures.py:94-232`,
keeping the same structural conventions (no bias under batch-norm, last layer
always biased, shapes flattened/unflattened around the core).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import (KAIMING_UNIFORM, apply_norm, get_activation,
                     norm_uses_bias)


def _prod(shape) -> int:
    if isinstance(shape, int):
        return shape
    return math.prod(shape)


def _as_tuple(shape) -> tuple:
    return (shape,) if isinstance(shape, int) else tuple(shape)


class MLP(nn.Module):
    out_dim: int
    hid_dim: int = 128
    n_hid_layers: int = 1
    norm_layer: str = "identity"
    activation: str = "relu"
    dropout_p: float = 0.0
    dtype: str = "float32"  # "bfloat16" = MXU mixed precision (params fp32)

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        d = jnp.dtype(self.dtype)
        use_bias = norm_uses_bias(self.norm_layer)
        act_f = get_activation(self.activation)
        # flatten everything but batch into features
        x = x.reshape(x.shape[0], -1).astype(d)
        for _ in range(self.n_hid_layers):
            x = nn.Dense(self.hid_dim, use_bias=use_bias, dtype=d,
                         kernel_init=KAIMING_UNIFORM)(x)
            x = apply_norm(self.norm_layer, x, training=training)
            x = act_f()(x).astype(d)
            if self.dropout_p > 0:
                x = nn.Dropout(self.dropout_p, deterministic=not training)(x)
        return nn.Dense(self.out_dim, dtype=d,
                        kernel_init=KAIMING_UNIFORM)(x).astype(jnp.float32)


class FlattenMLP(nn.Module):
    """MLP over flattened input, reshaped to `out_shape` (architectures.py:170-200)."""

    out_shape: int | Sequence[int]
    hid_dim: int = 128
    n_hid_layers: int = 1
    norm_layer: str = "identity"
    activation: str = "relu"
    dropout_p: float = 0.0
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        out_shape = _as_tuple(self.out_shape)
        y = MLP(
            out_dim=_prod(out_shape),
            hid_dim=self.hid_dim,
            n_hid_layers=self.n_hid_layers,
            norm_layer=self.norm_layer,
            activation=self.activation,
            dropout_p=self.dropout_p,
            dtype=self.dtype,
        )(x, training=training)
        return y.reshape((x.shape[0],) + out_shape)


class FlattenLinear(nn.Module):
    """Single linear over flattened input (architectures.py:203-232)."""

    out_shape: int | Sequence[int]

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        out_shape = _as_tuple(self.out_shape)
        x = x.reshape(x.shape[0], -1)
        y = nn.Dense(_prod(out_shape), kernel_init=KAIMING_UNIFORM)(x)
        return y.reshape((x.shape[0],) + out_shape)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, *, training: bool = False):
        return x
