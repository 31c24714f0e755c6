"""The learnable compressor: encoder + rate + distortion + online probe.

TPU-native redesign of `/root/reference/lossyless/learnable_compressors.py`.
Instead of a LightningModule with three optimizers re-dispatching
`training_step`, this is one flax module whose single `step` computes the
combined objective

    loss = lambda * distortion + beta_t * rate      (RD bound, :241-275)
         + online probe CE on stop_gradient(z)      (:289-291)
         + coder quantile aux loss                  (:293-295)

inside one jit'd update; the trainer partitions gradients onto three optax
optimizers by parameter path (see train/state.py). The annealed-beta gradient
trick (:256-261) is preserved via stop_gradient.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.annealer import Annealer
from ..core.math import LOG2
from ..nn.registry import get_architecture
from .distortions import (DistortionConfig, make_distortion_estimator,
                          prediction_loss)
from .distributions import detach, from_suff_param, n_suff_params
from .rates import RateConfig, make_rate_estimator


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    arch: str = "mlp"
    z_dim: int = 128
    family: str = "deterministic"        # deterministic|diaggaussian
    arch_kwargs: dict = dataclasses.field(default_factory=dict)
    # path to pretrained tower weights loaded into params["p_ZlX"]["mapper"]
    # before training (npz/orbax flax export, or a torch .pt state dict run
    # through the matching converter) — the reference's PretrainedSSL loads
    # real CLIP/SimCLR/SwAV weights at model construction
    # (architectures.py:356-376); compose with frozen=("p_ZlX",) for the
    # frozen-tower bottleneck presets
    pretrained_path: str = ""


@dataclasses.dataclass(frozen=True)
class OnlineEvalConfig:
    is_online: bool = True
    arch: str = "mlp"
    arch_kwargs: dict = dataclasses.field(default_factory=dict)
    is_classification: bool = True


@dataclasses.dataclass(frozen=True)
class LossConfig:
    beta: float = 0.1
    factor_beta_rate: float = 1.0        # rate.factor_beta
    factor_beta_dist: float = 1.0        # distortion.factor_beta (=> lambda)
    beta_anneal: str = "linear"          # mode for the Annealer
    n_steps_anneal: int = 1000


@dataclasses.dataclass(frozen=True)
class CompressorConfig:
    encoder: EncoderConfig = EncoderConfig()
    rate: RateConfig = RateConfig()
    distortion: DistortionConfig = DistortionConfig()
    online: OnlineEvalConfig = OnlineEvalConfig()
    loss: LossConfig = LossConfig()
    in_shape: Sequence[int] = (2,)
    target_shape: int = 1                # classes (clf) or dims (reg)
    aux_shape: Any = None                # target of the direct distortion


class CondEncoder(nn.Module):
    """Architecture -> sufficient stats -> conditional distribution
    (reference distributions.py:18-78)."""

    cfg: EncoderConfig
    in_shape: Sequence[int]

    def setup(self):
        n_p = n_suff_params(self.cfg.family)
        self.mapper = get_architecture(
            self.cfg.arch, tuple(self.in_shape) if not isinstance(self.in_shape, int)
            else self.in_shape, self.cfg.z_dim * n_p, **self.cfg.arch_kwargs)

    def __call__(self, x, *, training: bool = False):
        suff = self.mapper(x, training=training)
        return from_suff_param(self.cfg.family, suff.astype(jnp.float32))


class OnlineEvaluator(nn.Module):
    """Probe on stop_gradient(z) (reference predictors.py:235-301)."""

    cfg: OnlineEvalConfig
    z_dim: int
    target_shape: int

    def setup(self):
        self.model = get_architecture(self.cfg.arch, self.z_dim,
                                      self.target_shape, **self.cfg.arch_kwargs)

    def __call__(self, z, y, *, training: bool = False):
        z = jax.lax.stop_gradient(z)
        y_hat = self.model(z, training=training)
        if self.cfg.is_classification:
            # unlabeled samples carry target -1 (e.g. STL10's unlabeled
            # split, reference images.py:662-666): mask them out of the
            # probe loss/metrics instead of letting the label gather wrap
            # to the last class. An all-unlabeled batch yields loss 0 (and
            # therefore zero probe updates).
            valid = (y >= 0)
            denom = jnp.maximum(valid.sum(), 1).astype(jnp.float32)
            per = prediction_loss(y_hat, jnp.maximum(y, 0), True)
            loss = jnp.where(valid, per, 0.0).sum() / denom
            hit = (jnp.argmax(y_hat, -1) == y).astype(jnp.float32)
            acc = jnp.where(valid, hit, 0.0).sum() / denom
            logs = {"online_loss": loss, "online_acc": acc,
                    "online_err": 1.0 - acc}
        else:
            loss = prediction_loss(y_hat, y, False).mean()
            logs = {"online_loss": loss}
        return loss, logs


class LearnableCompressor(nn.Module):
    cfg: CompressorConfig

    def setup(self):
        c = self.cfg
        self.p_ZlX = CondEncoder(c.encoder, c.in_shape)
        self.rate_estimator = make_rate_estimator(c.encoder.z_dim, c.rate)
        self.distortion_estimator = make_distortion_estimator(
            c.distortion, c.encoder.z_dim, c.aux_shape)
        if c.online.is_online:
            self.online_evaluator = OnlineEvaluator(
                c.online, c.encoder.z_dim, c.target_shape)
        # careful: this "beta" is 1/beta from the paper (reference :37)
        final_beta = c.loss.beta * c.loss.factor_beta_rate
        self.beta_annealer = Annealer(
            final_beta * 1e-5, final_beta,
            n_steps_anneal=max(1, c.loss.n_steps_anneal),
            mode=c.loss.beta_anneal)

    # -- inference ----------------------------------------------------------

    def encode(self, x):
        """x -> mean of p(Z|X) (the raw encoder forward, no quantization).

        Named method (vs an ad-hoc lambda) so pipeline stages can share ONE
        jitted compilation of the encoder across featurizer-eval,
        communication and predictor stages.
        """
        return self.p_ZlX(x, training=False).mean

    def features(self, x, *, training: bool = False, rng=None):
        """x -> z_hat (the reference's forward(is_features=True), :123-167)."""
        p_zlx = self.p_ZlX(x, training=training)
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        z = p_zlx.rsample(r1) if rng is not None else p_zlx.mean
        z_hat, _, _ = self.rate_estimator(z, p_zlx, training=training, rng=r2)
        return z_hat

    def reconstruct(self, x, *, rng=None):
        """x -> x_hat in [0,1] (direct distortion only)."""
        z_hat = self.features(x, training=False, rng=rng)
        return self.distortion_estimator.reconstruct(z_hat)

    # -- training objective -------------------------------------------------

    def step(self, x, targets, aux_target, *, training: bool, step: int,
             rng=None, is_rate_only: bool = False):
        """One RD step. Returns (loss, logs).

        `targets` is the downstream label (online probe); `aux_target` the
        distortion target (input / representative / positive example /
        unused for lossy_Z) — reference data contract (utils/data/base.py:82-109).
        """
        c = self.cfg
        rngs = (jax.random.split(rng, 4) if rng is not None
                else [None] * 4)

        # contrastive recipes encode TWO views. concat_views fuses them into
        # one 2B-batch forward (one encoder + one rate pass, better MXU
        # occupancy); the default two-pass form matches the reference's
        # sequential positive encode (distortions.py:305-338). Identical for
        # per-sample nets; BatchNorm sees joint 2B stats when fused (the
        # SimCLR convention). Rate logs then average both views.
        is_two_view = (c.distortion.mode == "contrastive"
                       and not c.distortion.is_already_featurized)
        fuse_views = is_two_view and c.distortion.concat_views

        enc_in = jnp.concatenate([x, aux_target], 0) if fuse_views else x
        p_zlx = self.p_ZlX(enc_in, training=training)
        z = p_zlx.rsample(rngs[0]) if rng is not None else p_zlx.mean
        z_hat, rates, r_logs = self.rate_estimator(
            z, p_zlx, training=training, rng=rngs[1], step=step)

        if not c.rate.is_endToEnd:
            # rate trained without backprop into the encoder (rates.py:136-144)
            z_det = jax.lax.stop_gradient(z)
            _, rates, _ = self.rate_estimator(
                z_det, detach(p_zlx), training=training, rng=rngs[1], step=step)
        elif c.rate.warmup_steps > 0:
            # warmup: detached-rate path for the first warmup_steps
            # (reference warmup_k_epoch); where() zeroes the unselected
            # branch's gradient. Two estimator calls are REQUIRED here:
            # only the rate loss detaches from the encoder during warmup
            # while z_hat (-> distortion) stays live, so the inputs cannot
            # be where()-selected instead. Not a 2x runtime cost:
            # stop_gradient is identity in the forward HLO, so XLA CSEs
            # the duplicated estimator forward; the residual duplicate is
            # the estimator's backward, whose whole marginal measures
            # within run noise (PERF.md train-step attribution).
            z_det = jax.lax.stop_gradient(z)
            _, rates_det, _ = self.rate_estimator(
                z_det, detach(p_zlx), training=training, rng=rngs[1],
                step=step)
            in_warmup = jnp.asarray(step) < c.rate.warmup_steps
            rates = jnp.where(in_warmup, rates_det, rates)

        if fuse_views:
            # split the fused batch back into (anchor, positive); the
            # positive view's rates are discarded exactly as the two-pass
            # form discards them (only the anchor's rate enters the loss)
            b = x.shape[0]
            z_hat, z_pos_hat = z_hat[:b], z_hat[b:]
            rates = rates[:b]

        if is_rate_only:
            r_logs = dict(r_logs)
            r_logs["rate"] = rates.mean() / LOG2
            return rates.mean(), r_logs

        if fuse_views:
            dist_target = z_pos_hat
        elif is_two_view:
            # encode the positive view with the same compressor
            p_pos = self.p_ZlX(aux_target, training=training)
            z_pos = p_pos.rsample(rngs[2]) if rng is not None else p_pos.mean
            z_pos_hat, _, _ = self.rate_estimator(
                z_pos, p_pos, training=training, rng=rngs[3], step=step)
            dist_target = z_pos_hat
        else:
            dist_target = aux_target

        distortions, d_logs = self.distortion_estimator(
            z_hat, dist_target, p_zlx, training=training)

        loss, logs = self._rd_loss(rates, distortions, step)
        logs.update(r_logs)
        logs.update(d_logs)
        logs.update(zmin=z_hat.min(), zmax=z_hat.max(), zmean=z_hat.mean())

        # online probe (own optimizer group; grads stop at z)
        if c.online.is_online and targets is not None:
            online_loss, online_logs = self.online_evaluator(
                z_hat, targets, training=training)
            loss = loss + online_loss
            logs.update(online_logs)

        # coder aux loss (quantile optimizer group)
        if hasattr(self.rate_estimator, "aux_loss"):
            aux = self.rate_estimator.aux_loss()
            loss = loss + aux
            logs["coder_loss"] = aux

        return loss, logs

    def _rd_loss(self, rates, distortions, step):
        """distortion + beta*rate with annealed-beta gradient trick (:241-275)."""
        c = self.cfg.loss
        rates = rates.astype(jnp.float32)
        distortions = distortions.astype(jnp.float32)

        curr_beta = self.beta_annealer(step)
        final_beta = c.beta * c.factor_beta_rate
        labda = 1.0 / c.factor_beta_dist

        loose_loss = jax.lax.stop_gradient(
            (labda * distortions + final_beta * rates).mean())

        rate = rates.mean()
        distortion = distortions.mean()

        # gradients from annealed beta; reported value uses final beta
        beta_rate = curr_beta * rate
        beta_rate = beta_rate - jax.lax.stop_gradient(beta_rate) \
            + final_beta * jax.lax.stop_gradient(rate)

        loss = labda * distortion + beta_rate
        logs = {
            "loose_loss": loose_loss / LOG2,
            "loss": loss / LOG2,
            "rate": rate / LOG2,
            "distortion": distortion / LOG2,
            "ratedist": (rate + distortion) / LOG2,
            "beta": curr_beta,
        }
        return loss, logs

    def __call__(self, x, targets, aux_target, *, training: bool = False,
                 step: int = 0, rng=None):
        return self.step(x, targets, aux_target, training=training, step=step,
                         rng=rng)
