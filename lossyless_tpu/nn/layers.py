"""Shared layers: GDN, normalization/activation factories.

TPU-native equivalents of the reference's layer helpers
(`/root/reference/lossyless/architectures.py:685-721`). Layout is NHWC
(channels-last) throughout — the native TPU convolution layout — rather than
the reference's NCHW.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.math import lower_bound


class GDN(nn.Module):
    """Generalized divisive normalization (Ballé et al. 2016).

    y_i = x_i / sqrt(beta_i + sum_j gamma_ij x_j^2)   (inverse=False)
    y_i = x_i * sqrt(...)                              (inverse=True)

    Replaces `compressai.layers.GDN` used by the reference's BALLE encoder
    (architectures.py:719-721). Parameters are stored as square roots and
    lower-bounded so the normalizer stays positive; a plain fused
    elementwise+1x1-matmul — XLA fuses this into the surrounding convs.
    """

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        beta_sqrt = self.param(
            "beta_sqrt", lambda k: jnp.ones((c,), jnp.float32))
        gamma_sqrt = self.param(
            "gamma_sqrt",
            lambda k: jnp.sqrt(self.gamma_init * jnp.eye(c, dtype=jnp.float32)))

        beta = lower_bound(beta_sqrt, self.beta_min ** 0.5) ** 2
        gamma = gamma_sqrt ** 2

        x32 = x.astype(jnp.float32)
        norm = jnp.einsum("...i,ij->...j", x32 * x32, gamma) + beta
        if self.inverse:
            out = x32 * jnp.sqrt(norm)
        else:
            out = x32 * jax.lax.rsqrt(norm)
        return out.astype(x.dtype)


def get_norm(norm_layer: str | None, use_running_average: bool | None = None):
    """'batchnorm' | 'groupnorm' | 'layernorm' | 'identity'.

    On TPU meshes BatchNorm stats sync via axis_name='data' (the reference
    forces SyncBatchNorm under DDP, main.py:474).
    """
    if norm_layer in (None, "identity"):
        return lambda: (lambda x: x)
    if "batch" in norm_layer:
        return lambda: nn.BatchNorm(
            use_running_average=use_running_average, axis_name=None,
            momentum=0.9, epsilon=1e-5)
    if "group" in norm_layer:
        return lambda: nn.GroupNorm(num_groups=None, group_size=16)
    if "layer" in norm_layer:
        return lambda: nn.LayerNorm()
    raise ValueError(f"unknown norm_layer={norm_layer}")


def get_activation(activation: str, inverse: bool = False) -> Callable[..., Any]:
    """Activation factory mirroring architectures.py:708-721."""
    acts = {
        "relu": lambda: jax.nn.relu,
        "gelu": lambda: jax.nn.gelu,
        "silu": lambda: jax.nn.silu,
        "swish": lambda: jax.nn.silu,
        "tanh": lambda: jnp.tanh,
        "elu": lambda: jax.nn.elu,
        "leakyrelu": lambda: jax.nn.leaky_relu,
        "quickgelu": lambda: (lambda x: x * jax.nn.sigmoid(1.702 * x)),
    }
    key = activation.lower()
    if key == "gdn":
        return lambda: GDN(inverse=inverse)
    if key in acts:
        return acts[key]
    raise ValueError(f"unknown activation={activation}")



