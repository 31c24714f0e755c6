"""Conditional Gaussian entropy model (scale hyperprior, Ballé et al. 2018).

TPU-native equivalent of the Gaussian conditional used by the reference's
hyperprior rate estimators (`/root/reference/lossyless/rates.py:571-722`):
per-element Gaussians whose scales (and optionally means) are predicted by a
side network, coded against a shared 64-level log-spaced scale table
(rates.py:567-568).

Stateless pure functions; float32 island.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erfc as np_erfc
from scipy.special import erfcinv as np_erfcinv

from ..core.math import lower_bound, standardized_cumulative

LIKELIHOOD_BOUND = 1e-9
TAIL_MASS = 1e-9


def default_scale_table(min_scale=0.11, max_scale=256.0, levels=64) -> np.ndarray:
    """64 log-spaced scales (reference rates.py:567-568)."""
    return np.exp(np.linspace(math.log(min_scale), math.log(max_scale), levels))


def likelihood(z: jax.Array, scales: jax.Array, means: jax.Array | None = None,
               scale_bound: float = 0.11) -> jax.Array:
    """P(round(Z)=z | scale, mean) for a Gaussian; all shapes broadcastable."""
    z = z.astype(jnp.float32)
    scales = lower_bound(scales.astype(jnp.float32), scale_bound)
    values = z - means.astype(jnp.float32) if means is not None else z
    values = jnp.abs(values)
    upper = standardized_cumulative((0.5 - values) / scales)
    lower_ = standardized_cumulative((-0.5 - values) / scales)
    return upper - lower_


def quantize(z: jax.Array, mode: str, means: jax.Array | None = None,
             key: jax.Array | None = None):
    z = z.astype(jnp.float32)
    if mode == "noise":
        noise = jax.random.uniform(key, z.shape, jnp.float32, -0.5, 0.5)
        return z + noise
    m = means.astype(jnp.float32) if means is not None else 0.0
    if mode == "dequantize":
        return jnp.round(z - m) + m
    if mode == "symbols":
        return jnp.round(z - m).astype(jnp.int32)
    raise ValueError(f"unknown quantize mode {mode}")


def forward(z: jax.Array, scales: jax.Array, means: jax.Array | None = None, *,
            training: bool, key: jax.Array | None = None,
            scale_bound: float = 0.11):
    """Returns (z_hat, likelihoods) mirroring `GaussianConditional.forward`."""
    mode = "noise" if training else "dequantize"
    z_hat = quantize(z, mode, means, key)
    lik = likelihood(z_hat, scales, means, scale_bound)
    return z_hat, lower_bound(lik, LIKELIHOOD_BOUND)


def build_indexes(scales: jax.Array, scale_table: np.ndarray) -> jax.Array:
    """Index of the smallest table scale >= each element's scale."""
    st = jnp.asarray(scale_table[:-1], dtype=jnp.float32)
    scales = jnp.maximum(scales.astype(jnp.float32), float(scale_table[0]))
    # count of table entries strictly below scale == searchsorted
    return jnp.sum(scales[..., None] > st[None, :], axis=-1).astype(jnp.int32)


def build_cdf_tables(scale_table: np.ndarray, tail_mass: float = TAIL_MASS):
    """Quantized CDFs per table scale (reference `update_scale_table` path)."""
    from .entropy_bottleneck import CdfTables
    from .rans import pmf_to_quantized_cdf

    st = np.asarray(scale_table, dtype=np.float64)
    multiplier = -_np_standardized_quantile(tail_mass / 2)
    pmf_center = np.ceil(st * multiplier).astype(np.int64)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(
        np.arange(max_length, dtype=np.float64)[None, :] - pmf_center[:, None])
    upper = _np_standardized_cumulative((0.5 - samples) / st[:, None])
    lower = _np_standardized_cumulative((-0.5 - samples) / st[:, None])
    pmf = upper - lower
    tail = 2.0 * lower[:, :1]

    n = len(st)
    cdf = np.zeros((n, max_length + 2), dtype=np.int32)
    for i in range(n):
        prob = np.concatenate([pmf[i, : pmf_length[i]], tail[i]])
        row = pmf_to_quantized_cdf(prob)
        cdf[i, : len(row)] = row
    return CdfTables(
        quantized_cdf=cdf,
        cdf_length=(pmf_length + 2).astype(np.int32),
        offset=(-pmf_center).astype(np.int32),
    )


def _np_standardized_cumulative(x):
    return 0.5 * np_erfc(-x * (2 ** -0.5))


def _np_standardized_quantile(q):
    # inverse of _np_standardized_cumulative
    return -math.sqrt(2.0) * np_erfcinv(2.0 * q)
