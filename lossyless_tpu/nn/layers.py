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

# Reference init parity (`/root/reference/lossyless/helpers.py:153-192`
# weights_init, applied by every architecture/rate/distortion constructor):
# Linear layers are kaiming_uniform over fan_in with the relu gain
# (bound = sqrt(6/fan_in)); Conv layers are kaiming_normal over fan_out
# (std = sqrt(2/fan_out)); biases are zeroed (the flax default). Flax's
# lecun_normal default halves the weight variance relative to this scheme,
# which measurably shifts early training dynamics, so the trained-from-
# scratch architectures (MLP/CNN/BALLE/ResNet) take these as kernel_init
# defaults. The CLIP towers keep OpenAI's own normal(0.02)-style init.
# (torch quirk not reproduced: for ConvTranspose, torch's fan_out counts
# in_channels; here fan_out = out_channels * receptive field for all convs.)
KAIMING_UNIFORM = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")
KAIMING_NORMAL_OUT = nn.initializers.variance_scaling(2.0, "fan_out",
                                                      "normal")

# Reference BN-statistics parity: torch BatchNorm2d's momentum=0.1 means
# running = 0.9*running + 0.1*batch, i.e. flax momentum=0.9. Flax's 0.99
# default would update running statistics 10x slower than the reference,
# skewing eval-mode metrics for short runs. Every BatchNorm in the package
# (apply_norm, resnet, clip_resnet) uses this constant.
BN_MOMENTUM = 0.9


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


def norm_uses_bias(norm_layer: str | None) -> bool:
    """Dense/conv bias is dropped under any norm (architectures.py:141)."""
    return norm_layer in (None, "identity")


def apply_norm(norm_layer: str | None, x, *, training: bool):
    """Apply the named normalization inside a compact flax module.

    'batchnorm' | 'groupnorm' | 'layernorm' | 'identity'/None. Under pjit
    BatchNorm's batch statistics reduce over the global (sharded) batch,
    giving SyncBatchNorm semantics (reference forces it under DDP,
    main.py:474).
    """
    if norm_layer in (None, "identity"):
        return x
    if "batch" in norm_layer:
        return nn.BatchNorm(use_running_average=not training, momentum=BN_MOMENTUM)(x)
    if "group" in norm_layer:
        c = x.shape[-1]
        groups = 8 if c % 8 == 0 else 1
        return nn.GroupNorm(num_groups=groups)(x)
    if "layer" in norm_layer:
        return nn.LayerNorm()(x)
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



