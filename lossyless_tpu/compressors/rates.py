"""Rate estimators: learn/bound the bit-rate of Z and perform real coding.

TPU-native redesign of `/root/reference/lossyless/rates.py`:

* `Lossless` — no lossy coding; logs gzip'd float bits via a host callback.
* `MIRate` — KL[p(Z|x) || q(Z)] against a unit-Gaussian marginal.
* `HRateFactorizedPrior` — per-dim affine + factorized entropy bottleneck.
* `HRateHyperprior` — MLP side-encoder -> EB-coded side info -> conditional
  Gaussian over Z (mean+scale prediction).
* `HRateHyperpriorSpatial` — hyperprior applied per spatial position of a
  BALLE latent (positions folded into batch, rates summed back).

All estimators are flax modules whose `__call__(z, p_zlx, training, rng,
step)` returns `(z_hat, rates_in_nats, logs)` entirely inside jit; the real
entropy coding (`compress`/`decompress`) is host-side, driven by CDF tables
built from the learned parameters (see `build_codec`). Likelihoods are fp32
islands (reference wraps them in autocast(False), rates.py:104).

Parameter-group conventions for the 3-optimizer split
(learnable_compressors.py:343-368): every entropy-bottleneck quantile lives
at a path ending in "quantiles", which the trainer maps to the "coder"
optimizer group.
"""

from __future__ import annotations

import dataclasses
import io
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..coding import entropy_bottleneck as eb
from ..coding import gaussian_conditional as gc
from ..coding.rans import RansCodec
from ..core.math import LOG2
from .distributions import DiagGaussian, detach, kl_unit_gaussian


@dataclasses.dataclass(frozen=True)
class RateConfig:
    mode: str = "H_factorized"          # lossless|MI|H_factorized|H_hyper|H_spatial
    eb_filters: tuple = (3, 3, 3)
    eb_init_scale: float = 10.0
    # use the fused Pallas likelihood kernel (coding/pallas_eb.py) instead of
    # the jnp chain for the entropy bottleneck's forward
    eb_use_pallas: bool = False
    side_z_dim: int | None = None
    factor_dim: int = 5
    is_pred_mean: bool = True
    is_endToEnd: bool = True
    # rate-estimator warmup: for the first `warmup_steps` the rate loss is
    # computed on a detached encoder (reference warmup_k_epoch,
    # rates.py:136-144, in steps rather than epochs)
    warmup_steps: int = 0
    # epoch-denominated variant matching the reference's rate.kwargs.
    # warmup_k_epoch exactly: the pipeline translates it to warmup_steps
    # once steps_per_epoch is known (ignored if warmup_steps already set)
    warmup_k_epochs: int = 0
    n_channels: int | None = None       # for H_spatial: latent channels


class EntropyBottleneckModule(nn.Module):
    """Flax wrapper registering the functional EB parameters."""

    channels: int
    filters: tuple = (3, 3, 3)
    init_scale: float = 10.0
    use_pallas: bool = False  # fused likelihood kernel (coding/pallas_eb.py)

    def setup(self):
        cfg = eb.EBConfig(self.channels, self.filters, self.init_scale)
        template = eb.init_params(cfg, jax.random.key(0))

        def make(k, v):
            if k.startswith("bias"):
                return self.param(k, lambda key: jax.random.uniform(
                    key, v.shape, jnp.float32, -0.5, 0.5))
            return self.param(k, lambda key: v)

        self._keys = tuple(template.keys())
        for k, v in template.items():
            setattr(self, f"p_{k}", make(k, v))

    @property
    def eb_params(self) -> dict:
        return {k: getattr(self, f"p_{k}") for k in self._keys}

    def __call__(self, z, *, training: bool, rng=None):
        if not self.use_pallas:
            return eb.forward(self.eb_params, z, training=training, key=rng)
        from ..coding import pallas_eb
        from ..core.math import lower_bound

        mode = "noise" if training else "dequantize"
        z_hat = eb.quantize(self.eb_params, z, mode, rng)
        lik = pallas_eb.likelihood(self.eb_params, z_hat)
        return z_hat, lower_bound(lik, eb.LIKELIHOOD_BOUND)

    def aux_loss(self):
        return eb.aux_loss(self.eb_params)


class _AffineZ(nn.Module):
    """Per-dim (z + bias) * exp(scale) preconditioner (rates.py:423-438)."""

    z_dim: int

    def setup(self):
        self.scaling = self.param(
            "scaling", lambda k: jnp.zeros((self.z_dim,), jnp.float32))
        self.biasing = self.param(
            "biasing", lambda k: jnp.zeros((self.z_dim,), jnp.float32))

    def process_in(self, z):
        return (z.astype(jnp.float32) + self.biasing) * jnp.exp(self.scaling)

    def process_out(self, z_hat):
        return (z_hat / jnp.exp(self.scaling)) - self.biasing


def _nats_to_bits_mean(x):
    return jnp.mean(x) / LOG2


class Lossless(nn.Module):
    """Lossless float coding baseline (rates.py:318-344): z passes through.

    The reference gzip-codes the batch *inside* the forward to log the rate;
    on TPU host callbacks are unsupported inside jit, and the gzip'd size is
    constant w.r.t. parameters anyway (the reference multiplies it into the
    loss with zero gradient). So inside jit the rate term is a
    gradient-connected zero and the true gzip bits are computed host-side by
    `lossless_bits` during evaluation.
    """

    z_dim: int

    def __call__(self, z, p_zlx, *, training: bool, rng=None, step=0):
        rates = z.mean(-1) * 0.0  # shape (B,), zero value and gradient
        return z, rates, {}


def lossless_bits(z_np: np.ndarray) -> float:
    """gzip'd bits/sample of the raw float representation (rates.py:325-335)."""
    with io.BytesIO() as f:
        np.savez_compressed(f, np.asarray(z_np))
        return f.getbuffer().nbytes * 8 / z_np.shape[0]


class MIRate(nn.Module):
    """I[Z,X] upper bound: KL[p(Z|x) || N(0,I)] (rates.py:348-391)."""

    z_dim: int

    def __call__(self, z, p_zlx, *, training: bool, rng=None, step=0):
        if isinstance(p_zlx, DiagGaussian):
            kl = kl_unit_gaussian(p_zlx)
            h_zlx = p_zlx.entropy()
        else:
            # deterministic encoder: cross entropy -log q(z)
            var = 1.0
            kl = 0.5 * (z ** 2 / var + jnp.log(2 * math.pi * var)).sum(-1)
            h_zlx = jnp.zeros(z.shape[0])
        logs = {
            "I_q_ZX": _nats_to_bits_mean(kl),
            "H_ZlX": _nats_to_bits_mean(h_zlx),
        }
        logs["H_q_Z"] = logs["I_q_ZX"] + logs["H_ZlX"]
        return z, kl, logs


class HRateFactorizedPrior(nn.Module):
    """Factorized-prior entropy coding of Z (rates.py:509-564)."""

    z_dim: int
    cfg: RateConfig = RateConfig()

    def setup(self):
        self.affine = _AffineZ(self.z_dim)
        self.entropy_bottleneck = EntropyBottleneckModule(
            self.z_dim, self.cfg.eb_filters, self.cfg.eb_init_scale,
            use_pallas=self.cfg.eb_use_pallas)

    def __call__(self, z, p_zlx, *, training: bool, rng=None, step=0):
        z_in = self.affine.process_in(z)
        z_hat, q_z = self.entropy_bottleneck(z_in, training=training, rng=rng)
        neg_log_q_z = -jnp.log(q_z).sum(-1)
        logs = {"H_q_Z": _nats_to_bits_mean(neg_log_q_z), "H_ZlX": 0.0}
        return self.affine.process_out(z_hat), neg_log_q_z, logs

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class HRateHyperprior(nn.Module):
    """Mean-scale hyperprior over Z (rates.py:571-722)."""

    z_dim: int
    cfg: RateConfig = RateConfig(mode="H_hyper")

    def setup(self):
        side = self.cfg.side_z_dim or max(10, self.z_dim // self.cfg.factor_dim)
        self.side_z_dim = side
        self.affine = _AffineZ(self.z_dim)
        self.entropy_bottleneck = EntropyBottleneckModule(
            side, self.cfg.eb_filters, self.cfg.eb_init_scale,
            use_pallas=self.cfg.eb_use_pallas)
        from ..nn.mlp import MLP
        hid = max(self.z_dim, 256)
        self.side_encoder = MLP(out_dim=side, hid_dim=hid, n_hid_layers=2)
        out = self.z_dim * 2 if self.cfg.is_pred_mean else self.z_dim
        self.z_encoder = MLP(out_dim=out, hid_dim=hid, n_hid_layers=2)

    def _gaussian_params(self, side_z_hat, training):
        gp = self.z_encoder(side_z_hat, training=training)
        if self.cfg.is_pred_mean:
            scales, means = jnp.split(gp, 2, axis=-1)
        else:
            scales, means = gp, None
        return scales, means

    def __call__(self, z, p_zlx, *, training: bool, rng=None, step=0):
        z_in = self.affine.process_in(z)
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))

        side_z = self.side_encoder(z_in, training=training)
        side_z_hat, q_s = self.entropy_bottleneck(side_z, training=training,
                                                  rng=r1)
        scales, means = self._gaussian_params(side_z_hat, training)
        z_hat, q_zls = gc.forward(z_in, scales, means, training=training,
                                  key=r2)

        neg_log_q_s = -jnp.log(q_s).sum(-1)
        neg_log_q_zls = -jnp.log(q_zls).sum(-1)
        neg_log_q_zs = neg_log_q_s + neg_log_q_zls
        logs = {
            "H_q_ZlS": _nats_to_bits_mean(neg_log_q_zls),
            "H_q_Z": _nats_to_bits_mean(neg_log_q_zs),
            "H_q_S": _nats_to_bits_mean(neg_log_q_s),
            "H_ZlX": 0.0,
        }
        return self.affine.process_out(z_hat), neg_log_q_zs, logs

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class HRateHyperpriorSpatial(nn.Module):
    """Hyperprior per spatial position of a BALLE latent (rates.py:760-813).

    The flattened latent (B, C*H*W) is refolded to ((B*H*W), C); positions
    become batch elements of the inner hyperprior — on TPU this is simply a
    bigger, better-utilized batch for the same matmuls.
    """

    z_dim: int           # full flattened dim C*H*W
    n_channels: int
    cfg: RateConfig = RateConfig(mode="H_spatial")

    def setup(self):
        self.inner = HRateHyperprior(self.n_channels, self.cfg)
        side = int(math.isqrt(self.z_dim // self.n_channels))
        if side * side * self.n_channels != self.z_dim:
            raise ValueError("H_spatial needs a square spatial latent")
        self.side_dim = side

    def __call__(self, z, p_zlx, *, training: bool, rng=None, step=0):
        b = z.shape[0]
        s, c = self.side_dim, self.n_channels
        # (B, C*H*W) -> (B*H*W, C): latent stored channel-major like the
        # reference's einops 'b (c h w) -> (b h w) c'
        zs = z.reshape(b, c, s * s).transpose(0, 2, 1).reshape(b * s * s, c)
        z_hat, rates, logs = self.inner(zs, p_zlx, training=training, rng=rng,
                                        step=step)
        z_hat = z_hat.reshape(b, s * s, c).transpose(0, 2, 1).reshape(b, -1)
        rates = rates.reshape(b, s * s).sum(-1)
        logs = {k: v * s * s for k, v in logs.items()}
        return z_hat, rates, logs

    def aux_loss(self):
        return self.inner.aux_loss()


def make_rate_estimator(z_dim: int, cfg: RateConfig):
    if cfg.mode == "lossless":
        return Lossless(z_dim)
    if cfg.mode == "MI":
        return MIRate(z_dim)
    if cfg.mode == "H_factorized":
        return HRateFactorizedPrior(z_dim, cfg)
    if cfg.mode == "H_hyper":
        return HRateHyperprior(z_dim, cfg)
    if cfg.mode == "H_spatial":
        return HRateHyperpriorSpatial(z_dim, cfg.n_channels, cfg)
    raise ValueError(f"unknown rate mode={cfg.mode}")


# ---------------------------------------------------------------------------
# Host-side real coding (the reference's compress/decompress + update():
# rates.py:286-314,556-564,697-722). Operates on extracted parameter trees.
# ---------------------------------------------------------------------------


class FactorizedCoder:
    """compress/decompress for HRateFactorizedPrior parameters."""

    def __init__(self, params: dict):
        # params: {"affine": {scaling,biasing}, "entropy_bottleneck": {...}}
        self.scaling = np.asarray(params["affine"]["scaling"])
        self.biasing = np.asarray(params["affine"]["biasing"])
        ebp = {k: np.asarray(v) for k, v in params["entropy_bottleneck"].items()}
        self.eb_params = ebp
        tables = eb.build_cdf_tables(ebp)
        self.codec = RansCodec(tables.quantized_cdf, tables.cdf_length,
                               tables.offset)
        self.medians = np.asarray(eb.medians(ebp))
        self.indexes = np.arange(len(self.medians), dtype=np.int32)

    def process_in(self, z):
        return (np.asarray(z, np.float32) + self.biasing) * np.exp(self.scaling)

    def process_out(self, z_hat):
        return z_hat / np.exp(self.scaling) - self.biasing

    def compress(self, z) -> list[bytes]:
        z_in = self.process_in(z)
        symbols = np.round(z_in - self.medians[None]).astype(np.int32)
        return self.codec.encode_batch(symbols, self.indexes)

    def decompress(self, streams: list[bytes]) -> np.ndarray:
        symbols = self.codec.decode_batch(streams, self.indexes)
        z_hat = symbols.astype(np.float32) + self.medians[None]
        return self.process_out(z_hat)


def _host_mlp_forward(params: dict, x: np.ndarray) -> np.ndarray:
    """NumPy forward of `nn.mlp.MLP` as the rate estimators build it
    (identity norm, relu, no dropout — rates.py:213-217): Dense_0..Dense_{n-1}
    with relu between all but the last. Pure host work, fp32."""
    x = np.asarray(x, np.float32).reshape(len(x), -1)
    n_dense = len(params)
    for i in range(n_dense):
        p = params[f"Dense_{i}"]
        x = x @ np.asarray(p["kernel"], np.float32) \
            + np.asarray(p["bias"], np.float32)
        if i < n_dense - 1:
            x = np.maximum(x, 0.0, out=x)
    return x


def _host_build_indexes(scales: np.ndarray,
                        scale_table: np.ndarray) -> np.ndarray:
    """NumPy mirror of `gc.build_indexes` (same semantics: index of the
    smallest table scale >= element scale)."""
    st = np.asarray(scale_table[:-1], np.float32)
    s = np.maximum(np.asarray(scales, np.float32), np.float32(scale_table[0]))
    return np.searchsorted(st, s, side="left").astype(np.int32)


class HyperpriorCoder:
    """compress/decompress for HRateHyperprior (rates.py:697-722).

    Two streams per sample: EB-coded side info, then the main latent coded
    against per-element conditional Gaussians whose scale/mean come from the
    decoded side info. The sender's side-encoder runs jitted on device (it
    consumes the full latent batch); everything the RECEIVER needs — the
    z-encoder MLP that maps decoded side info to Gaussian params, the index
    build, and the output affine — runs as pure host numpy, matching the
    reference's CPU-only decode (README.md:64-66). Compress uses the SAME
    host functions for indexes/means, so sender and receiver agree
    bit-exactly by construction (no cross-backend fp32 boundary ties).
    """

    def __init__(self, module: "HRateHyperprior", params: dict,
                 batch_stats: dict | None = None):
        self.module = module
        self.variables = {"params": params}
        if batch_stats:
            self.variables["batch_stats"] = batch_stats

        ebp = {k: np.asarray(v)
               for k, v in params["entropy_bottleneck"].items()}
        side_tables = eb.build_cdf_tables(ebp)
        self.side_codec = RansCodec(side_tables.quantized_cdf,
                                    side_tables.cdf_length, side_tables.offset)
        self.side_medians = np.asarray(eb.medians(ebp))
        self.side_indexes = np.arange(len(self.side_medians), dtype=np.int32)

        self.scale_table = gc.default_scale_table()
        z_tables = gc.build_cdf_tables(self.scale_table)
        self.z_codec = RansCodec(z_tables.quantized_cdf, z_tables.cdf_length,
                                 z_tables.offset)

        # host-side copies of the receiver path (zero device dispatches in
        # decompress; on a tunneled chip each dispatch costs more than the
        # whole decode)
        self._z_encoder_np = jax.tree.map(lambda v: np.asarray(v, np.float32),
                                          dict(params["z_encoder"]))
        self._out_scale_np = np.exp(
            np.asarray(params["affine"]["scaling"], np.float32))
        self._biasing_np = np.asarray(params["affine"]["biasing"], np.float32)
        self._is_pred_mean = module.cfg.is_pred_mean

        def _encode_side(x):
            def fn(m, z):
                z_in = m.affine.process_in(z)
                side_z = m.side_encoder(z_in, training=False)
                return z_in, side_z
            return module.apply(self.variables, x, method=fn)

        self._encode_side = jax.jit(_encode_side)

    def _indexes_means(self, side_z_hat_np):
        gp = _host_mlp_forward(self._z_encoder_np, side_z_hat_np)
        if self._is_pred_mean:
            scales, means = np.split(gp, 2, axis=-1)
        else:
            scales, means = gp, None
        return _host_build_indexes(scales, self.scale_table), means

    def compress(self, z) -> list[list[bytes]]:
        z_in, side_z = map(np.asarray, self._encode_side(np.asarray(z)))
        side_symbols = np.round(side_z - self.side_medians[None]).astype(np.int32)
        side_streams = self.side_codec.encode_batch(side_symbols,
                                                    self.side_indexes)
        # decoder sees the *quantized* side info
        side_z_hat = side_symbols.astype(np.float32) + self.side_medians[None]
        indexes, means = self._indexes_means(side_z_hat)
        z_symbols = np.round(z_in - (means if means is not None else 0.0)) \
            .astype(np.int32)
        z_streams = self.z_codec.encode_batch_varidx(z_symbols, indexes)
        return [z_streams, side_streams]

    def decompress(self, all_strings) -> np.ndarray:
        z_streams, side_streams = all_strings
        side_symbols = self.side_codec.decode_batch(side_streams,
                                                    self.side_indexes)
        side_z_hat = side_symbols.astype(np.float32) + self.side_medians[None]
        indexes, means = self._indexes_means(side_z_hat)
        z_symbols = self.z_codec.decode_batch_varidx(z_streams, indexes)
        z_hat = z_symbols.astype(np.float32) + \
            (means if means is not None else 0.0)
        # output affine on host: decompress never touches the device
        return z_hat / self._out_scale_np - self._biasing_np


class SpatialHyperpriorCoder:
    """compress/decompress for HRateHyperpriorSpatial (rates.py:760-813).

    Folds spatial positions into the batch axis (one hyperprior message per
    position), then regroups streams per sample. Stream layout per sample:
    the position streams are concatenated in scan order.
    """

    def __init__(self, module: "HRateHyperpriorSpatial", params: dict,
                 batch_stats: dict | None = None):
        self.module = module
        self.n_channels = module.n_channels
        self.side_dim = int(math.isqrt(module.z_dim // module.n_channels))
        inner_bs = batch_stats.get("inner") if batch_stats else None
        self.inner = HyperpriorCoder(
            HRateHyperprior(module.n_channels, module.cfg),
            params["inner"], inner_bs)

    def _fold(self, z: np.ndarray) -> np.ndarray:
        b = z.shape[0]
        s, c = self.side_dim, self.n_channels
        return z.reshape(b, c, s * s).transpose(0, 2, 1).reshape(b * s * s, c)

    def _unfold(self, zs: np.ndarray, b: int) -> np.ndarray:
        s, c = self.side_dim, self.n_channels
        return zs.reshape(b, s * s, c).transpose(0, 2, 1).reshape(b, -1)

    def compress(self, z) -> list[list[bytes]]:
        z = np.asarray(z)
        return self.inner.compress(self._fold(z))

    def decompress(self, all_strings, batch_size: int | None = None):
        zs = self.inner.decompress(all_strings)
        n_pos = self.side_dim ** 2
        b = batch_size or len(all_strings[0]) // n_pos
        return self._unfold(zs, b)
