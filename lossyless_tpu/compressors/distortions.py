"""Distortion estimators: direct reconstruction, contrastive (BINCE), lossy-Z.

TPU-native redesign of `/root/reference/lossyless/distortions.py`.

The contrastive estimator is the interesting one for SPMD: the reference
gathers negatives across GPUs with a custom autograd all-gather
(`GatherFromGpus`, helpers.py:873-893; distortions.py:327-337). Here the loss
is written over the *global* batch; under pjit with a batch-sharded input XLA
inserts the all-gather over ICI automatically and the collective is
differentiable by construction — no custom backward, and loss values are
identical to the single-device computation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.math import LOG2
from ..nn.registry import get_architecture


@dataclasses.dataclass(frozen=True)
class DistortionConfig:
    mode: str = "direct"                 # direct|contrastive|lossy_Z
    # direct:
    arch: str | None = None
    arch_kwargs: dict = dataclasses.field(default_factory=dict)
    data_mode: str = "image"             # image|distribution|feature
    is_classification: bool = True
    # contrastive:
    temperature: float = 0.01
    is_train_temperature: bool = True
    is_cosine: bool = True
    effective_batch_size: float | None = None
    is_already_featurized: bool = False
    is_project: bool = True
    project_dim: int = 128
    # fuse the two augmented views into ONE 2B-batch encoder/rate forward
    # instead of two sequential B-batch passes (compressor.py::step). Better
    # MXU occupancy and half the dispatch count; numerics differ only
    # through BatchNorm batch statistics (joint 2B stats — the SimCLR
    # convention — vs per-view stats, the reference's two-pass convention).
    # Measured A/B: bin/train_step_bench.py --ab-concat; PERF.md round 5.
    concat_views: bool = False
    # lossy_Z:
    p_norm: float = 1.0


def prediction_loss(y_hat, y, is_classification=True,
                    agg_over_tasks: str | None = "mean"):
    """Per-sample CE or MSE (helpers.py:439-489).

    Shapes follow the reference contract: predictions are
    (batch, Y_dim[, n_tasks]); the loss is averaged over Y_dim, then
    aggregated over tasks with `agg_over_tasks`
    ({mean,sum,max,min,median,std} or None to keep the per-task axis).
    """
    if is_classification:
        y = y.astype(jnp.int32)
        if y_hat.ndim <= 2:
            logp = jax.nn.log_softmax(y_hat, axis=-1)
            per = -jnp.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
        else:
            # multi-task: torch F.cross_entropy semantics — the CLASS axis
            # is dim 1, trailing dims are tasks: y_hat (B, C, *tasks),
            # y (B, *tasks) (reference helpers.py:459-461)
            logp = jax.nn.log_softmax(y_hat, axis=1)
            per = -jnp.take_along_axis(logp, y[:, None, ...], axis=1)[:, 0]
    else:
        per = (y_hat - y.astype(y_hat.dtype)) ** 2
    b = y_hat.shape[0]
    if per.ndim <= 2:
        per = per.reshape(b, -1, 1)          # single task
    per_task = per.mean(axis=1)              # (batch, n_tasks)
    if agg_over_tasks is None:
        return per_task
    agg = {"mean": jnp.mean, "sum": jnp.sum, "max": jnp.max,
           "min": jnp.min, "median": jnp.median, "std": jnp.std}
    return agg[agg_over_tasks](per_task, axis=-1)


class DirectDistortion(nn.Module):
    """Variational reconstruction bound -log q(Y|Z) (distortions.py:41-172)."""

    z_dim: int
    y_shape: Any                         # int or (H, W, C)
    cfg: DistortionConfig = DistortionConfig()

    def setup(self):
        is_img = self.cfg.data_mode == "image"
        arch = self.cfg.arch or ("cnn" if is_img else "mlp")
        self.is_img_out = is_img
        self.q_YlZ = get_architecture(arch, self.z_dim, self.y_shape,
                                      **self.cfg.arch_kwargs)

    def __call__(self, z_hat, aux_target, p_zlx=None, *, training: bool = False,
                 rng=None):
        y_hat = self.q_YlZ(z_hat, training=training)
        if self.is_img_out:
            is_colored = aux_target.shape[-1] == 3
            if is_colored:
                # color: Gaussian likelihood on sigmoided output in [0,1]
                y_hat = jax.nn.sigmoid(y_hat)
                neg_log = (y_hat - aux_target) ** 2
            else:
                # grayscale: Bernoulli with logits
                neg_log = _bce_with_logits(y_hat, aux_target)
            neg_log = neg_log.reshape(z_hat.shape[0], -1).sum(-1)
        else:
            neg_log = prediction_loss(y_hat, aux_target,
                                      self.cfg.is_classification)
        logs = {"H_q_TlZ": jnp.mean(neg_log) / LOG2}
        return neg_log, logs

    def reconstruct(self, z_hat):
        """Decoder output mapped to [0,1] images (compressor forward path)."""
        y_hat = self.q_YlZ(z_hat, training=False)
        return jax.nn.sigmoid(y_hat) if self.is_img_out else y_hat


def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


class ContrastiveDistortion(nn.Module):
    """InfoNCE (BINCE) distortion (distortions.py:175-405).

    `z_hat` and `z_pos_hat` are the two augmented views' representations
    (the second view is encoded by the parent compressor before calling).
    The loss uses all other examples in the *global* batch as negatives.
    """

    cfg: DistortionConfig = DistortionConfig(mode="contrastive")

    def setup(self):
        if self.cfg.is_project:
            from ..nn.mlp import MLP
            self.projector = MLP(out_dim=self.cfg.project_dim,
                                 hid_dim=self.cfg.project_dim, n_hid_layers=1)
        if self.cfg.is_train_temperature:
            self.logit_scale = self.param(
                "logit_scale",
                lambda k: jnp.asarray(math.log(1 / 0.07), jnp.float32))

    def __call__(self, z_hat, z_pos_hat, p_zlx=None, *, training: bool = False,
                 rng=None):
        batch_size = z_hat.shape[0]
        zs = jnp.concatenate([z_hat, z_pos_hat], axis=0).astype(jnp.float32)
        if self.cfg.is_project:
            zs = self.projector(zs, training=training)
        if self.cfg.is_cosine:
            # safe normalization: eps INSIDE the sqrt. jnp.linalg.norm has a
            # NaN gradient at exactly-zero rows (sqrt'(0)=inf, and the 0 from
            # a clipped denominator multiplies it into 0*inf) — and zero rows
            # really occur: a freshly-initialized projector with a dead ReLU
            # row outputs exactly its zero bias. torch's F.cosine_similarity
            # defines the subgradient as 0 there; this matches.
            sq = jnp.sum(jnp.square(zs), axis=-1, keepdims=True)
            zs = zs / jnp.sqrt(sq + 1e-12)

        n = 2 * batch_size
        # (2B, 2B) global similarity — XLA all-gathers shards automatically
        logits = zs @ zs.T

        # positive of i is i+B (mod 2B)
        pos_idx = (jnp.arange(n) + batch_size) % n
        n_classes = n - 1

        if self.cfg.effective_batch_size is not None:
            effective_n_classes = 2 * self.cfg.effective_batch_size - 1
            to_mult = (effective_n_classes - 1) / (n_classes - 1)
            # add log(to_mult) to negatives == subtract from positive logit
            to_add = -math.log(to_mult)
            pos_onehot = jax.nn.one_hot(pos_idx, n)
            logits = logits + to_add * pos_onehot
        else:
            effective_n_classes = n_classes

        if self.cfg.is_train_temperature:
            temperature = 1.0 / jnp.clip(jnp.exp(self.logit_scale),
                                         max=1.0 / self.cfg.temperature)
        else:
            temperature = self.cfg.temperature
        logits = logits / temperature

        # mask self-similarity AFTER temperature scaling: -inf entries must
        # not touch the learnable temperature's gradient (NaN via d(-inf/T)/dT).
        # -inf masking replaces the reference's boolean-select reshape
        # (static shapes for XLA).
        self_mask = jnp.eye(n, dtype=bool)
        logits = jnp.where(self_mask, -jnp.inf, logits)

        logp = jax.nn.log_softmax(logits, axis=-1)
        hat_H_mlz = -jnp.take_along_axis(logp, pos_idx[:, None], axis=-1)[:, 0]

        hat_H_m = math.log(effective_n_classes)
        logs = {
            "I_q_zm": (hat_H_m - hat_H_mlz.mean()) / LOG2,
            "hat_H_m": hat_H_m / LOG2,
            "n_negatives": jnp.asarray(float(n_classes)),
        }
        # average the two views per anchor
        distortion = (hat_H_mlz[:batch_size] + hat_H_mlz[batch_size:]) / 2
        return distortion, logs


class LossyZDistortion(nn.Module):
    """Lp distance between z_hat and the encoder mean (distortions.py:408-450).

    Used with frozen pretrained encoders (CLIP): compress Z without looking
    at X again.
    """

    cfg: DistortionConfig = DistortionConfig(mode="lossy_Z")

    def __call__(self, z_hat, aux_target, p_zlx=None, *, training: bool = False,
                 rng=None):
        target = p_zlx.mean
        p = self.cfg.p_norm
        dist = jnp.sum(jnp.abs(z_hat - target) ** p, axis=-1) ** (1.0 / p)
        return dist, {}


def make_distortion_estimator(cfg: DistortionConfig, z_dim: int, y_shape):
    if cfg.mode == "direct":
        return DirectDistortion(z_dim, y_shape, cfg)
    if cfg.mode == "contrastive":
        return ContrastiveDistortion(cfg)
    if cfg.mode == "lossy_Z":
        return LossyZDistortion(cfg)
    raise ValueError(f"unknown distortion mode={cfg.mode}")
