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
    # run the frozen featurizer INSIDE the probe's jitted train step, with
    # fresh augmentations drawn on the raw inputs every epoch (reference
    # featurizer.is_on_the_fly, main.py:163 + predictors.py:41-58). The
    # default pre-featurizes the dataset once (faster, more RAM).
    is_on_the_fly: bool = False


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


def featurize_dataset(featurize_fn, batches,
                      pad_to: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Run the frozen featurizer over (x, y, aux) batches -> (Z, Y) arrays.

    `pad_to`: pad a ragged final batch up to this size (repeating the last
    row) and trim its features — keeps ONE compiled program shape (and mesh
    divisibility) while featurizing every sample instead of dropping the
    tail.
    """
    zs, ys = [], []
    for x, y, _ in batches:
        n = len(x)
        if pad_to is not None and n < pad_to:
            reps = np.broadcast_to(np.asarray(x)[-1:],
                                   (pad_to - n,) + np.asarray(x).shape[1:])
            x = np.concatenate([np.asarray(x), reps])
        zs.append(np.asarray(featurize_fn(x))[:n])
        ys.append(np.asarray(y))
    return np.concatenate(zs), np.concatenate(ys)


@dataclasses.dataclass
class PredictorTrainer:
    """Fit/eval the probe on featurized data (or raw data when on-the-fly)."""

    cfg: PredictorConfig
    in_shape: Any
    target_shape: int

    def _init(self, sample_z, seed: int):
        model = Predictor(self.cfg, self.in_shape, self.target_shape)
        k = jax.random.key(seed)
        # 'dropout' stream for mlp_probe dropout_p > 0; fold_in keeps the
        # 'params' stream identical to the pre-dropout-support init
        variables = model.init({"params": k,
                                "dropout": jax.random.fold_in(k, 1)},
                               jnp.asarray(sample_z), training=True)
        tx = optax.adam(self.cfg.lr)
        params = variables["params"]
        return (model, params, variables.get("batch_stats", {}), tx,
                tx.init(params))

    def _make_step(self, model, tx, featurize_fn=None):
        """Jitted probe update; the frozen featurizer is fused into the same
        XLA program when given (on-the-fly mode)."""

        @jax.jit
        def step(params, batch_stats, opt_state, xb, yb, rng):
            if featurize_fn is not None:
                xb = jax.lax.stop_gradient(featurize_fn(xb))

            def loss_fn(p):
                v = {"params": p}
                rngs = {"dropout": rng}
                if batch_stats:
                    v["batch_stats"] = batch_stats
                    y_hat, new_state = model.apply(
                        v, xb, training=True, rngs=rngs,
                        mutable=["batch_stats"])
                else:
                    y_hat = model.apply(v, xb, training=True, rngs=rngs)
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

        return step

    def _finalize(self, model, params, batch_stats):
        self.model = model
        self.variables = {"params": params}
        if batch_stats:
            self.variables["batch_stats"] = batch_stats
        return self

    def fit(self, z_train, y_train, z_val=None, y_val=None, seed: int = 0,
            log_every: int = 0):
        """Fit the probe on featurized arrays.

        TPU framing: the (N, z_dim) features are staged in HBM ONCE and each
        epoch is a single jitted `lax.scan` over gathered batches — no
        per-step host indexing / device_put dispatch (the per-step path cost
        ~1000x the step compute for big feature sets, e.g. the 1M-sample
        banana predictor stage). Batch composition matches the per-step
        loop: one host-generated permutation per epoch, `n // bsz` full
        batches.
        """
        model, params, batch_stats, tx, opt_state = self._init(
            z_train[:2], seed)

        n = len(z_train)
        host_rng = np.random.default_rng(seed)
        bsz = min(self.cfg.batch_size, n)
        steps = max(1, n // bsz)
        z_dev = jnp.asarray(z_train)
        y_dev = jnp.asarray(y_train)

        @jax.jit
        def epoch(params, batch_stats, opt_state, z_all, y_all, order, ekey):
            def body(carry, idx_key):
                params, bs, opt = carry
                idx, key = idx_key

                def loss_fn(p):
                    v = {"params": p}
                    xb, yb = z_all[idx], y_all[idx]
                    rngs = {"dropout": key}
                    if bs:
                        v["batch_stats"] = bs
                        y_hat, new_state = model.apply(
                            v, xb, training=True, rngs=rngs,
                            mutable=["batch_stats"])
                    else:
                        y_hat = model.apply(v, xb, training=True, rngs=rngs)
                        new_state = {}
                    loss = prediction_loss(
                        y_hat, yb, self.cfg.is_classification).mean()
                    return loss, new_state
                (loss, new_state), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt = tx.update(grads, opt, params)
                params = optax.apply_updates(params, updates)
                return (params, new_state.get("batch_stats", bs), opt), loss
            idxs = order[:steps * bsz].reshape(steps, bsz)
            keys = jax.random.split(ekey, steps)
            (params, batch_stats, opt_state), losses = jax.lax.scan(
                body, (params, batch_stats, opt_state), (idxs, keys))
            return params, batch_stats, opt_state, losses

        for ep in range(self.cfg.n_epochs):
            order = jnp.asarray(host_rng.permutation(n))
            params, batch_stats, opt_state, _ = epoch(
                params, batch_stats, opt_state, z_dev, y_dev, order,
                jax.random.fold_in(jax.random.key(seed), ep))

        return self._finalize(model, params, batch_stats)

    def fit_onfly(self, dataset, featurize_fn, seed: int = 0):
        """Train with the frozen featurizer running inside the train step.

        Reference parity: `featurizer.is_on_the_fly` (main.py:163) wraps the
        probe around the frozen featurizer (predictors.py:41-58) so
        augmentations are re-drawn on the *raw* inputs every epoch and the
        features are never materialized. TPU framing: featurizer forward +
        probe update are ONE fused XLA program; only raw batches cross the
        host/device boundary.
        """
        bsz = min(self.cfg.batch_size, len(dataset))
        x0, _, _ = next(dataset.batches(bsz, n_epochs=1, seed=seed))
        sample_z = featurize_fn(jnp.asarray(x0[:2]))
        model, params, batch_stats, tx, opt_state = self._init(sample_z, seed)
        step = self._make_step(model, tx, featurize_fn=featurize_fn)

        base_key = jax.random.key(seed)
        i = 0
        for epoch in range(self.cfg.n_epochs):
            for xb, yb, _ in dataset.batches(bsz, n_epochs=1,
                                             seed=seed + epoch):
                if len(xb) != bsz:
                    continue  # static shapes: skip the ragged tail batch
                params, batch_stats, opt_state, loss = step(
                    params, batch_stats, opt_state,
                    jnp.asarray(xb), jnp.asarray(yb),
                    jax.random.fold_in(base_key, i))
                i += 1

        return self._finalize(model, params, batch_stats)

    def predict(self, z) -> np.ndarray:
        return np.asarray(self.model.apply(self.variables, jnp.asarray(z),
                                           training=False))

    def evaluate(self, z, y, balancing_weights: dict | None = None) -> dict:
        """Loss/acc/err + per-task aggregations + balanced variants
        (predictors.py:129-186)."""
        import time

        self.predict(z)  # compile outside the timing
        t0 = time.time()
        y_hat = self.predict(z)
        inference_time = (time.time() - t0) / max(1, len(z))

        loss = np.asarray(prediction_loss(
            jnp.asarray(y_hat), jnp.asarray(y), self.cfg.is_classification))
        logs = {"loss": float(loss.mean()),
                # probe forward wall seconds per image (predictors.py:101-112)
                "inference_time": inference_time}
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
