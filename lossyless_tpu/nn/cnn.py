"""Convolutional architectures: pyramid CNN (transposable) and BALLE.

Flax/NHWC equivalents of `/root/reference/lossyless/architectures.py:382-682`.
Structural conventions preserved:

* CNN: channel-doubling stride-2 3x3 pyramid down to side 2, then a dense
  head; the transposed variant mirrors it with ConvTranspose + pre-dense.
* BALLE: 5x5 stride-2 conv stack with constant hidden width; the latent keeps
  spatial structure (`channel_out_dim` channels over a (side/2^n)^2 grid,
  flattened to a vector) — the property the spatial hyperprior rate model
  relies on (rates.py:760-813).
* Non-power-of-2 sides are resized to the closest power of two
  (architectures.py:481-509) with bilinear `jax.image.resize`.

Mixed precision: `dtype="bfloat16"` runs convs/matmuls in bf16 on the MXU
(reference fp16 `trainer.precision: 16` analog); params and norm statistics
stay fp32, and decoder outputs are returned fp32.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (KAIMING_NORMAL_OUT, KAIMING_UNIFORM, apply_norm,
                     get_activation, norm_uses_bias)


def _closest_pow2(n: int) -> int:
    return 2 ** round(math.log2(n))


class CNNEncoder(nn.Module):
    """Image (B,H,W,C) -> vector (B,out_dim)."""

    out_dim: int
    in_shape: Sequence[int]  # (H, W, C)
    hid_dim: int = 32
    norm_layer: str = "batchnorm"
    activation: str = "relu"
    n_layers: int | None = None
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        d = jnp.dtype(self.dtype)
        h, w, _ = self.in_shape
        h2, w2 = _closest_pow2(h), _closest_pow2(w)
        if (h2, w2) != (h, w):
            x = jax.image.resize(x, (x.shape[0], h2, w2, x.shape[-1]), "bilinear")
        n_layers = self.n_layers or int(math.log2(min(h2, w2)) - 1)
        use_bias = norm_uses_bias(self.norm_layer)
        act_f = get_activation(self.activation)
        x = x.astype(d)
        for i in range(n_layers):
            x = nn.Conv(self.hid_dim * 2 ** i, (3, 3), strides=2, padding=1,
                        use_bias=use_bias, dtype=d,
                        kernel_init=KAIMING_NORMAL_OUT)(x)
            x = apply_norm(self.norm_layer, x, training=training)
            x = act_f()(x).astype(d)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.out_dim, dtype=d,
                        kernel_init=KAIMING_UNIFORM)(x).astype(jnp.float32)


class CNNDecoder(nn.Module):
    """Vector (B,in_dim) -> image (B,H,W,C) (the transposed CNN)."""

    out_shape: Sequence[int]  # (H, W, C)
    hid_dim: int = 32
    norm_layer: str = "batchnorm"
    activation: str = "relu"
    n_layers: int | None = None
    dtype: str = "float32"

    @nn.compact
    def __call__(self, z, *, training: bool = False):
        d = jnp.dtype(self.dtype)
        h, w, c = self.out_shape
        h2, w2 = _closest_pow2(h), _closest_pow2(w)
        n_layers = self.n_layers or int(math.log2(min(h2, w2)) - 1)
        use_bias = norm_uses_bias(self.norm_layer)
        act_f = get_activation(self.activation)

        channels = [self.hid_dim * 2 ** i for i in range(n_layers)][::-1]
        end_h, end_w = h2 // 2 ** n_layers, w2 // 2 ** n_layers

        x = nn.Dense(channels[0] * end_h * end_w, use_bias=use_bias,
                     dtype=d, kernel_init=KAIMING_UNIFORM)(z.astype(d))
        x = x.reshape(z.shape[0], end_h, end_w, channels[0])
        outs = channels[1:] + [c]
        for i, out_chan in enumerate(outs):
            is_last = i == len(outs) - 1
            x = apply_norm(self.norm_layer, x, training=training)
            x = act_f()(x).astype(d)
            x = nn.ConvTranspose(out_chan, (3, 3), strides=(2, 2),
                                 padding="SAME",
                                 use_bias=use_bias or is_last, dtype=d,
                                 kernel_init=KAIMING_NORMAL_OUT)(x)
        if (h2, w2) != (h, w):
            x = jax.image.resize(x.astype(jnp.float32),
                                 (x.shape[0], h, w, c), "bilinear")
        return x.astype(jnp.float32)


class BalleEncoder(nn.Module):
    """Ballé-style analysis transform; output flattened spatial latent."""

    out_dim: int
    in_shape: Sequence[int]  # (H, W, C)
    hid_dim: int = 256
    n_layers: int = 4
    norm_layer: str = "batchnorm"
    activation: str = "relu"
    dtype: str = "float32"

    @property
    def channel_out_dim(self) -> int:
        h, w, _ = self.in_shape
        h2, w2 = _closest_pow2(h), _closest_pow2(w)
        end = (h2 // 2 ** self.n_layers) * (w2 // 2 ** self.n_layers)
        if self.out_dim % end != 0:
            raise ValueError(
                f"BALLE out_dim={self.out_dim} must be divisible by the "
                f"{end} spatial positions of the final feature map "
                f"({h2 // 2 ** self.n_layers}x{w2 // 2 ** self.n_layers} "
                f"for input {h}x{w} with n_layers={self.n_layers}); a "
                f"floor-divided latent would silently be "
                f"{(self.out_dim // end) * end}-dimensional")
        return self.out_dim // end

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        h, w, _ = self.in_shape
        h2, w2 = _closest_pow2(h), _closest_pow2(w)
        if (h2, w2) != (h, w):
            x = jax.image.resize(x, (x.shape[0], h2, w2, x.shape[-1]), "bilinear")
        use_bias = norm_uses_bias(self.norm_layer)
        act_f = get_activation(self.activation)
        d = jnp.dtype(self.dtype)
        x = x.astype(d)
        for i in range(self.n_layers):
            is_last = i == self.n_layers - 1
            out_c = self.channel_out_dim if is_last else self.hid_dim
            x = nn.Conv(out_c, (5, 5), strides=2, padding=2,
                        use_bias=use_bias or is_last, dtype=d,
                        kernel_init=KAIMING_NORMAL_OUT)(x)
            if not is_last:
                x = apply_norm(self.norm_layer, x, training=training)
                x = act_f()(x).astype(d)
        return x.reshape(x.shape[0], -1).astype(jnp.float32)


class BalleDecoder(nn.Module):
    """Ballé-style synthesis transform from a flattened spatial latent."""

    out_shape: Sequence[int]  # (H, W, C)
    in_dim: int
    hid_dim: int = 256
    n_layers: int = 4
    norm_layer: str = "batchnorm"
    activation: str = "relu"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, z, *, training: bool = False):
        h, w, c = self.out_shape
        h2, w2 = _closest_pow2(h), _closest_pow2(w)
        end_h, end_w = h2 // 2 ** self.n_layers, w2 // 2 ** self.n_layers
        chan = self.in_dim // (end_h * end_w)
        use_bias = norm_uses_bias(self.norm_layer)
        act_f = get_activation(self.activation, inverse=True)
        d = jnp.dtype(self.dtype)

        x = z.reshape(z.shape[0], end_h, end_w, chan).astype(d)
        for i in range(self.n_layers):
            is_last = i == self.n_layers - 1
            out_c = c if is_last else self.hid_dim
            x = nn.ConvTranspose(out_c, (5, 5), strides=(2, 2), padding="SAME",
                                 use_bias=use_bias or is_last, dtype=d,
                                 kernel_init=KAIMING_NORMAL_OUT)(x)
            if not is_last:
                x = apply_norm(self.norm_layer, x, training=training)
                x = act_f()(x).astype(d)
        if (h2, w2) != (h, w):
            x = jax.image.resize(x.astype(jnp.float32),
                                 (x.shape[0], h, w, c), "bilinear")
        return x.astype(jnp.float32)
