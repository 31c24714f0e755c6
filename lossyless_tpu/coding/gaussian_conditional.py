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


def build_cdf_tables(scale_table: np.ndarray, tail_mass: float = TAIL_MASS,
                     arithmetic: str = "float64"):
    """Quantized CDFs per table scale (reference `update_scale_table` path).

    `arithmetic="float64"` (default): numpy float64, torch-free — what this
    framework's own hyperprior coders use (self-consistent sender/receiver,
    rates.py HyperpriorCoder). `arithmetic="compressai"`: torch-fp32,
    op-for-op CompressAI's `GaussianConditional.update()` (including the
    fp32 scale table and scipy ppf multiplier) — required only when
    exchanging hyperprior streams with a CompressAI-based implementation,
    for the same reason as the entropy bottleneck (fp32 roundoff decides
    integer-table boundaries; see entropy_bottleneck.build_cdf_tables).
    """
    if arithmetic == "compressai":
        return _compressai_fp32_tables(scale_table, tail_mass)
    if arithmetic != "float64":
        raise ValueError(f"unknown arithmetic={arithmetic!r}")
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


def _compressai_fp32_tables(scale_table, tail_mass: float):
    """Torch-fp32 scale-table CDF build, bit-faithful to CompressAI's
    GaussianConditional.update(): fp32 scale table, scipy-ppf multiplier
    (float64 scalar, fp32 product), torch erfc cumulative, int32 centers.
    Host-side setup only — nothing in the jit path touches torch."""
    import torch
    from scipy.stats import norm as _norm

    from .entropy_bottleneck import CdfTables
    from .rans import pmf_to_quantized_cdf

    st = torch.as_tensor(np.asarray(scale_table), dtype=torch.float32)
    multiplier = -float(_norm.ppf(tail_mass / 2))
    pmf_center = torch.ceil(st * multiplier).int()
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = torch.abs(
        torch.arange(max_length).int() - pmf_center[:, None]).float()
    sscale = st.unsqueeze(1)

    def cum(x):
        return 0.5 * torch.erfc(float(-(2 ** -0.5)) * x)

    upper = cum((0.5 - samples) / sscale)
    lower = cum((-0.5 - samples) / sscale)
    pmf = upper - lower
    tail = 2.0 * lower[:, :1]

    n = len(st)
    cdf = np.zeros((n, max_length + 2), dtype=np.int32)
    for i in range(n):
        prob = pmf[i, : int(pmf_length[i])].tolist() + [float(tail[i, 0])]
        row = pmf_to_quantized_cdf(np.asarray(prob, np.float64))
        cdf[i, : len(row)] = row
    return CdfTables(
        quantized_cdf=cdf,
        cdf_length=(pmf_length + 2).numpy().astype(np.int32),
        offset=(-pmf_center).numpy().astype(np.int32),
    )


def compressai_scale_table(min_scale=0.11, max_scale=256.0,
                           levels=64) -> np.ndarray:
    """The scale table as CompressAI's get_scale_table computes it — torch
    fp32 linspace/exp (vs `default_scale_table`'s float64). Use together
    with `build_cdf_tables(..., arithmetic="compressai")` for stream
    interop with CompressAI-based hyperprior models."""
    import torch

    return torch.exp(torch.linspace(math.log(min_scale), math.log(max_scale),
                                    levels)).numpy()


def _np_standardized_cumulative(x):
    return 0.5 * np_erfc(-x * (2 ** -0.5))


def _np_standardized_quantile(q):
    # inverse of _np_standardized_cumulative
    return -math.sqrt(2.0) * np_erfcinv(2.0 * q)
