"""Fully-factorized learned entropy model ("entropy bottleneck").

TPU-native reimplementation of the univariate non-parametric density model of
Ballé et al. 2018 (appendix 6.1), the model behind the reference's rate
estimators (`/root/reference/lossyless/rates.py:509-564`) and the hub
compressor (`/root/reference/hub/compressor.py:49-63`).

Design notes (vs the reference's CompressAI module):

* Pure functions over a parameter pytree — usable inside `jit`/`grad`/`vmap`
  and shardable with `pjit`. No module state; quantization noise comes from an
  explicit PRNG key.
* The parameterization (per-channel chains of softplus-matrices, biases and
  tanh-factors, plus 3-point quantiles) matches the CompressAI layout exactly
  so the reference's published checkpoints (`hub/beta*/factorized_rate.pt`)
  load without conversion (see `lossyless_tpu/hub/load_reference.py`).
* Everything here is a float32 island: the reference wraps rate computation in
  `autocast(False)` (rates.py:104) because fp16 under/overflows the likelihood;
  on TPU we cast inputs up from bf16 explicitly.
* The batch axis is vectorized as the trailing axis of a `(channels, 1, batch)`
  layout so the tiny per-channel (<=3x3) matmul chain maps onto one fused
  batched einsum — XLA keeps it in registers/VMEM; there is no per-channel
  Python loop like the layer-unrolled torch version.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import lower_bound

LIKELIHOOD_BOUND = 1e-9
TAIL_MASS = 1e-9


@dataclasses.dataclass(frozen=True)
class EBConfig:
    channels: int
    filters: Sequence[int] = (3, 3, 3)
    init_scale: float = 10.0


def init_params(cfg: EBConfig, key: jax.Array) -> dict:
    """Initialize parameters; layout mirrors the reference checkpoint format."""
    filters = (1,) + tuple(cfg.filters) + (1,)
    n_layers = len(cfg.filters) + 1
    scale = cfg.init_scale ** (1.0 / n_layers)
    params = {}
    keys = jax.random.split(key, n_layers)
    for i in range(n_layers):
        init = math.log(math.expm1(1.0 / scale / filters[i + 1]))
        params[f"matrix{i}"] = jnp.full(
            (cfg.channels, filters[i + 1], filters[i]), init, dtype=jnp.float32)
        params[f"bias{i}"] = jax.random.uniform(
            keys[i], (cfg.channels, filters[i + 1], 1), jnp.float32, -0.5, 0.5)
        if i < n_layers - 1:
            params[f"factor{i}"] = jnp.zeros(
                (cfg.channels, filters[i + 1], 1), dtype=jnp.float32)
    params["quantiles"] = jnp.tile(
        jnp.array([-cfg.init_scale, 0.0, cfg.init_scale], dtype=jnp.float32),
        (cfg.channels, 1, 1))
    return params


def n_layers(params: dict) -> int:
    return sum(1 for k in params if k.startswith("matrix"))


def _logits_cumulative(params: dict, x: jax.Array, stop_gradient: bool) -> jax.Array:
    """Logit of the model CDF, evaluated pointwise.

    `x` has shape (channels, 1, N); returns the same shape. With
    ``stop_gradient`` the chain weights are frozen (used by the quantile aux
    loss so only `quantiles` train — reference rates.py:426,475-479).
    """
    L = n_layers(params)
    logits = x
    for i in range(L):
        m, b = params[f"matrix{i}"], params[f"bias{i}"]
        if stop_gradient:
            m, b = jax.lax.stop_gradient(m), jax.lax.stop_gradient(b)
        m = jax.nn.softplus(m)
        logits = jnp.einsum("coi,cin->con", m, logits) + b
        if i < L - 1:
            f = params[f"factor{i}"]
            if stop_gradient:
                f = jax.lax.stop_gradient(f)
            logits = logits + jnp.tanh(f) * jnp.tanh(logits)
    return logits


def _chan_major(z: jax.Array) -> jax.Array:
    # (batch, channels) -> (channels, 1, batch)
    return jnp.transpose(z, (1, 0))[:, None, :]


def _batch_major(v: jax.Array) -> jax.Array:
    # (channels, 1, batch) -> (batch, channels)
    return jnp.transpose(v[:, 0, :], (1, 0))


def likelihood(params: dict, z: jax.Array) -> jax.Array:
    """P(round(Z) = z) under the factorized model; z shape (batch, channels)."""
    v = _chan_major(z.astype(jnp.float32))
    lower = _logits_cumulative(params, v - 0.5, stop_gradient=False)
    upper = _logits_cumulative(params, v + 0.5, stop_gradient=False)
    # evaluate on the side with smaller magnitude for stability (sign trick)
    sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
    lik = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
    return _batch_major(lik)


def medians(params: dict) -> jax.Array:
    """Per-channel distribution medians, shape (channels,)."""
    return params["quantiles"][:, 0, 1]


def quantize(params: dict, z: jax.Array, mode: str, key: jax.Array | None = None):
    """'noise' (training surrogate), 'dequantize' (eval), or 'symbols' (int)."""
    z = z.astype(jnp.float32)
    if mode == "noise":
        assert key is not None
        noise = jax.random.uniform(key, z.shape, jnp.float32, -0.5, 0.5)
        return z + noise
    med = medians(params)[None, :]
    if mode == "dequantize":
        return jnp.round(z - med) + med
    if mode == "symbols":
        return jnp.round(z - med).astype(jnp.int32)
    raise ValueError(f"unknown quantize mode {mode}")


def forward(params: dict, z: jax.Array, *, training: bool,
            key: jax.Array | None = None):
    """Noise-quantize (train) / round-to-median (eval) + likelihood.

    Returns (z_hat, likelihoods), both (batch, channels); mirrors the
    reference's `EntropyBottleneck.forward` vector adapter (rates.py:55-62).
    """
    mode = "noise" if training else "dequantize"
    z_hat = quantize(params, z, mode, key)
    lik = likelihood(params, z_hat)
    lik = lower_bound(lik, LIKELIHOOD_BOUND)
    return z_hat, lik


def aux_loss(params: dict, tail_mass: float = TAIL_MASS) -> jax.Array:
    """Quantile loss: push quantiles to the (tail, median, 1-tail) points.

    Trained by the dedicated "coder" optimizer group (reference
    rates.py:426,475-479; learnable_compressors.py:293-295).
    """
    logits = _logits_cumulative(params, params["quantiles"], stop_gradient=True)
    t = math.log(2.0 / tail_mass - 1.0)
    target = jnp.array([-t, 0.0, t], dtype=jnp.float32)
    return jnp.sum(jnp.abs(logits - target[None, None, :]))


# ---------------------------------------------------------------------------
# Host-side CDF table construction (the reference's `update()`,
# rates.py:286-305 via CompressAI). Runs in numpy float64 on host; produces the
# integer tables consumed by the rANS codec.
# ---------------------------------------------------------------------------


def _np_logits_cumulative(params_np: dict, x: np.ndarray) -> np.ndarray:
    L = sum(1 for k in params_np if k.startswith("matrix"))
    logits = x
    for i in range(L):
        m = np.logaddexp(0.0, params_np[f"matrix{i}"])  # softplus
        logits = np.einsum("coi,cin->con", m, logits) + params_np[f"bias{i}"]
        if i < L - 1:
            logits = logits + np.tanh(params_np[f"factor{i}"]) * np.tanh(logits)
    return logits


def _np_sigmoid(x):
    return 0.5 * (1.0 + np.tanh(0.5 * x))


@dataclasses.dataclass
class CdfTables:
    """Quantized CDF tables for the rANS codec (one row per channel/index)."""

    quantized_cdf: np.ndarray  # (n, max_len) int32
    cdf_length: np.ndarray     # (n,) int32
    offset: np.ndarray         # (n,) int32


def build_cdf_tables(params, arithmetic: str = "float64") -> CdfTables:
    """Build per-channel quantized CDFs from the learned density.

    The effective tail mass is whatever the learned quantiles encode (they
    are trained against `aux_loss`'s TAIL_MASS target); there is no separate
    knob here.

    `arithmetic` picks the float pipeline the pmf is evaluated in:

    * ``"float64"`` (default) — numpy float64. Torch-free, best-conditioned,
      and what this framework's own fixtures pin. Use for self-consistent
      encode/decode within this framework.
    * ``"compressai"`` — torch float32, op-for-op the arithmetic of
      CompressAI's ``EntropyBottleneck.update()`` (the coder the reference
      imports, lossyless/rates.py:12-17). CompressAI evaluates the pmf in
      torch fp32 with the sign-conditional sigmoid; fp32 roundoff decides
      a handful of lround boundaries per published checkpoint (measured:
      7-14 of 512 channels differ from the float64 build on b001/b005/b01,
      tests/test_eb_torch_fuzz.py), and rANS requires EXACT table equality
      to cross-decode — so interop with reference-encoded streams must
      build tables this way. Requires torch.
    """
    if arithmetic == "compressai":
        return _compressai_fp32_tables(params)
    if arithmetic != "float64":
        raise ValueError(f"unknown arithmetic={arithmetic!r}")
    from .rans import pmf_to_quantized_cdf

    p = {k: np.asarray(v, dtype=np.float64) for k, v in params.items()}
    q = p["quantiles"]  # (C, 1, 3)
    med = q[:, 0, 1]
    minima = np.maximum(np.ceil(med - q[:, 0, 0]).astype(np.int64), 0)
    maxima = np.maximum(np.ceil(q[:, 0, 2] - med).astype(np.int64), 0)

    pmf_start = med - minima
    pmf_length = (maxima + minima + 1).astype(np.int64)
    max_length = int(pmf_length.max())

    samples = np.arange(max_length, dtype=np.float64)[None, None, :] \
        + pmf_start[:, None, None]
    lower = _np_logits_cumulative(p, samples - 0.5)
    upper = _np_logits_cumulative(p, samples + 0.5)
    sign = -np.sign(lower + upper)
    pmf = np.abs(_np_sigmoid(sign * upper) - _np_sigmoid(sign * lower))[:, 0, :]
    tail = _np_sigmoid(lower[:, 0, 0]) + _np_sigmoid(-upper[:, 0, -1])

    C = pmf.shape[0]
    cdf = np.zeros((C, max_length + 2), dtype=np.int32)
    for c in range(C):
        prob = np.concatenate([pmf[c, : pmf_length[c]], [tail[c]]])
        row = pmf_to_quantized_cdf(prob)
        cdf[c, : len(row)] = row
    return CdfTables(
        quantized_cdf=cdf,
        cdf_length=(pmf_length + 2).astype(np.int32),
        offset=(-minima).astype(np.int32),
    )


def _compressai_fp32_tables(params) -> CdfTables:
    """Torch-fp32 table build, bit-faithful to CompressAI's update().

    Mirrors EntropyBottleneck.update() + _pmf_to_cdf from CompressAI 1.1.x
    (the exact coder behind the reference's rates.py:286-305): float32
    throughout, torch's own softplus/tanh/sigmoid kernels, the
    sign-conditional sigmoid difference, int support bounds from fp32 ceil.
    numpy fp32 CANNOT substitute — torch's vectorized transcendentals differ
    from libm by ~1 ulp, which measurably flips lround boundaries
    (tests/test_eb_torch_fuzz.py). Hence torch (CPU) is required for this
    mode; it is a host-side, setup-time dependency only — nothing in the
    jit/TPU compute path touches it.
    """
    import torch  # deliberate: the only way to reproduce CompressAI's bits

    from .rans import pmf_to_quantized_cdf

    tp = {k: torch.as_tensor(np.asarray(v), dtype=torch.float32)
          for k, v in params.items()}
    n = sum(1 for k in tp if k.startswith("matrix"))

    def logits(x):
        u = x
        for k in range(n):
            m = torch.nn.functional.softplus(tp[f"matrix{k}"])
            u = torch.matmul(m, u) + tp[f"bias{k}"]
            if k < n - 1:
                u = u + torch.tanh(tp[f"factor{k}"]) * torch.tanh(u)
        return u

    q = tp["quantiles"]
    med = q[:, 0, 1]
    minima = torch.clamp(torch.ceil(med - q[:, 0, 0]).int(), min=0)
    maxima = torch.clamp(torch.ceil(q[:, 0, 2] - med).int(), min=0)
    pmf_start = med - minima.float()
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())

    samples = torch.arange(max_length).float()[None, None, :] \
        + pmf_start[:, None, None]
    half = float(0.5)
    lower = logits(samples - half)
    upper = logits(samples + half)
    sign = -torch.sign(lower + upper)
    pmf = torch.abs(torch.sigmoid(sign * upper)
                    - torch.sigmoid(sign * lower))[:, 0, :]
    tail = torch.sigmoid(lower[:, 0, 0]) + torch.sigmoid(-upper[:, 0, -1])

    n_ch = pmf.shape[0]
    cdf = np.zeros((n_ch, max_length + 2), dtype=np.int32)
    for c in range(n_ch):
        # .tolist() widens the exact fp32 values like CompressAI's
        # prob.tolist() -> vector<float> boundary (x*65536 is exact either
        # way: power-of-two scaling does not round)
        prob = pmf[c, : int(pmf_length[c])].tolist() + [float(tail[c])]
        row = pmf_to_quantized_cdf(np.asarray(prob, np.float64))
        cdf[c, : len(row)] = row
    return CdfTables(
        quantized_cdf=cdf,
        cdf_length=(pmf_length + 2).numpy().astype(np.int32),
        offset=(-minima).numpy().astype(np.int32),
    )
