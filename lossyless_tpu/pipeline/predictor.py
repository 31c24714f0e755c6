"""Downstream predictor stage: head trained on the frozen featurizer.

TPU-native equivalent of `/root/reference/lossyless/predictors.py:38-232` and
the featurize-whole-datamodule path (`utils/helpers.py:268-309`):

* `featurize_dataset` runs the frozen compressor over a dataset once and
  returns an in-memory feature dataset (the reference's SklearnDataModule of
  features) — so predictor training is tiny MLP matmuls on (N, z_dim).
* `Predictor` is the probe itself; its train step is an ordinary single-group
  optax update.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..compressors.distortions import prediction_loss
from ..nn.registry import get_architecture


@dataclasses.dataclass(frozen=True)
class PredictorConfig:
    arch: str = "mlp"
    arch_kwargs: dict = dataclasses.field(
        default_factory=lambda: dict(hid_dim=2048, n_hid_layers=2,
                                     norm_layer="batchnorm"))
    is_classification: bool = True
    lr: float = 3e-4
    n_epochs: int = 20
    batch_size: int = 256


class Predictor(nn.Module):
    cfg: PredictorConfig
    in_shape: Any
    target_shape: int

    def setup(self):
        self.predictor = get_architecture(
            self.cfg.arch, self.in_shape, self.target_shape,
            **self.cfg.arch_kwargs)

    def __call__(self, features, *, training: bool = False):
        return self.predictor(features, training=training)


def featurize_dataset(featurize_fn, batches) -> tuple[np.ndarray, np.ndarray]:
    """Run the frozen featurizer over (x, y, aux) batches -> (Z, Y) arrays."""
    zs, ys = [], []
    for x, y, _ in batches:
        zs.append(np.asarray(featurize_fn(x)))
        ys.append(np.asarray(y))
    return np.concatenate(zs), np.concatenate(ys)


@dataclasses.dataclass
class PredictorTrainer:
    """Fit/eval the probe on featurized data (or raw data when on-the-fly)."""

    cfg: PredictorConfig
    in_shape: Any
    target_shape: int

    def fit(self, z_train, y_train, z_val=None, y_val=None, seed: int = 0,
            log_every: int = 0):
        model = Predictor(self.cfg, self.in_shape, self.target_shape)
        rng = jax.random.key(seed)
        variables = model.init(rng, jnp.asarray(z_train[:2]), training=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = optax.adam(self.cfg.lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, batch_stats, opt_state, xb, yb):
            def loss_fn(p):
                v = {"params": p}
                if batch_stats:
                    v["batch_stats"] = batch_stats
                    y_hat, new_state = model.apply(
                        v, xb, training=True, mutable=["batch_stats"])
                else:
                    y_hat = model.apply(v, xb, training=True)
                    new_state = {}
                loss = prediction_loss(y_hat, yb,
                                       self.cfg.is_classification).mean()
                return loss, new_state
            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            bs = new_state.get("batch_stats", batch_stats)
            return params, bs, opt_state, loss

        n = len(z_train)
        host_rng = np.random.default_rng(seed)
        bsz = min(self.cfg.batch_size, n)
        for _ in range(self.cfg.n_epochs):
            order = host_rng.permutation(n)
            for i in range(0, n - bsz + 1, bsz):
                idx = order[i:i + bsz]
                params, batch_stats, opt_state, loss = step(
                    params, batch_stats, opt_state,
                    jnp.asarray(z_train[idx]), jnp.asarray(y_train[idx]))

        self.model = model
        self.variables = {"params": params}
        if batch_stats:
            self.variables["batch_stats"] = batch_stats
        return self

    def predict(self, z) -> np.ndarray:
        return np.asarray(self.model.apply(self.variables, jnp.asarray(z),
                                           training=False))

    def evaluate(self, z, y, balancing_weights: dict | None = None) -> dict:
        """Loss/acc/err + per-task aggregations + balanced variants
        (predictors.py:129-186)."""
        y_hat = self.predict(z)
        loss = np.asarray(prediction_loss(
            jnp.asarray(y_hat), jnp.asarray(y), self.cfg.is_classification))
        logs = {"loss": float(loss.mean())}
        for agg in ("max", "std", "min", "mean", "median"):
            a = prediction_loss(jnp.asarray(y_hat), jnp.asarray(y),
                                self.cfg.is_classification,
                                agg_over_tasks=agg)
            logs[f"tasks_{agg}"] = float(np.asarray(a).mean())
        if self.cfg.is_classification:
            pred = y_hat.argmax(-1)
            acc = float((pred == y).mean())
            logs.update(acc=acc, err=1 - acc)
        if balancing_weights:
            w = np.asarray([balancing_weights.get(str(int(yi)), 1.0)
                            for yi in y])
            logs["balanced_loss"] = float((loss * w).mean())
            if self.cfg.is_classification:
                logs["balanced_acc"] = float(((pred == y) * w).mean())
                logs["balanced_err"] = 1 - logs["balanced_acc"]
        return logs
