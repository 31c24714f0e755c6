"""Train state: one jit'd update over three optimizer groups.

The reference uses Lightning's multi-optimizer dispatch — `training_step` is
called once per optimizer {main, online, coder}
(`/root/reference/lossyless/learnable_compressors.py:277-303,370-416`), i.e.
three forward passes per batch. Here the combined objective is differentiated
once and `optax.multi_transform` routes gradient partitions by parameter
path:

* "coder"  — entropy-model quantiles (paths ending in `quantiles`),
  matching `aux_parameters()` (rates.py:475-479),
* "online" — the online evaluator probe (stop-gradient inputs),
* "main"   — everything else (encoder, rate nets, distortion nets).

This holds because each sub-loss touches a disjoint parameter set (probe
inputs are stop-gradient'ed; quantile aux loss freezes the density weights;
the density's medians only enter eval-mode quantization), so one backward
pass computes exactly the same three gradient sets as Lightning's three.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    mode: str = "adam"                   # adam|adamw|sgd
    lr: float = 3e-4
    weight_decay: float = 0.0
    # scheduler: {none, expdecay, unifmultistep, cosine, cosine_restart,
    # plateau} — the reference scheduler group (config/scheduler/*.yaml:
    # expdecay/unifmultistep via helpers.py:492-550, cosine =
    # CosineAnnealingLR, cosine_restart = CosineAnnealingWarmRestarts,
    # plateau = ReduceLROnPlateau through the torch passthrough branch)
    scheduler: str = "none"
    decay_factor: float = 1000.0
    k_steps: int = 3
    total_steps: int = 10000
    # bound alongside total_steps (bind_schedule_steps); epoch-denominated
    # schedulers (cosine_restart) and the plateau controller need it
    steps_per_epoch: int = 0
    restart_t0_epochs: int = 5           # cosine_restart T_0 (epochs)
    restart_mult: int = 2                # cosine_restart T_mult
    # plateau (torch ReduceLROnPlateau semantics, threshold_mode=rel;
    # config/scheduler/plateau.yaml; plateau_quick = factor .3, patience 5)
    plateau_factor: float = 0.2
    plateau_patience: int = 10           # epochs without improvement
    plateau_threshold: float = 1e-4      # relative improvement threshold
    plateau_min_lr: float = 1e-7


def _make_schedule(cfg: OptimConfig):
    if cfg.scheduler in ("none", "plateau") or cfg.total_steps <= 0:
        # total_steps<=0 = an unbound schedule: eval-only runs (n_epochs=0)
        # where nothing trains, or a direct TrainState consumer that didn't
        # bind steps — constant lr. Pipeline runs always bind via
        # run.py::_fill_steps; standalone scripts must do the same to get
        # the declared decay (bin/*_repro.py do). "plateau" is host-driven
        # (ReduceLROnPlateau + host_lr_scale), not a step schedule.
        return cfg.lr
    if cfg.scheduler == "expdecay":
        # decay lr by decay_factor over total_steps (helpers.py:492-550)
        return optax.exponential_decay(
            cfg.lr, transition_steps=cfg.total_steps,
            decay_rate=1.0 / cfg.decay_factor)
    if cfg.scheduler == "unifmultistep":
        k = cfg.k_steps
        gamma = (1.0 / cfg.decay_factor) ** (1.0 / k)
        # max(1,): with total_steps < k+1 the milestones would all collapse
        # to boundary 0 (dict key dedupe) and scale the lr from step 0
        delta = max(1, cfg.total_steps // (k + 1))
        return optax.piecewise_constant_schedule(
            cfg.lr, {delta * i: gamma for i in range(1, k + 1)})
    if cfg.scheduler == "cosine":
        # CosineAnnealingLR(T_max=max_epochs, eta_min=0): one half-cosine
        # from lr to 0 over training (config/scheduler/cosine.yaml)
        return optax.cosine_decay_schedule(cfg.lr, cfg.total_steps, alpha=0.0)
    if cfg.scheduler == "cosine_restart":
        # CosineAnnealingWarmRestarts(T_0=5 epochs, T_mult=2, eta_min=0)
        # (config/scheduler/cosine_restart.yaml): lr snaps back to base at
        # the start of each period, periods grow by restart_mult
        spe = cfg.steps_per_epoch
        if spe <= 0:
            raise ValueError(
                "cosine_restart is epoch-denominated: bind steps_per_epoch "
                "via bind_schedule_steps(cfg, total, steps_per_epoch)")
        import itertools

        periods, t = [], max(1, cfg.restart_t0_epochs * spe)
        while sum(periods) < cfg.total_steps:
            periods.append(t)
            t *= max(1, cfg.restart_mult)
        boundaries = list(itertools.accumulate(periods))[:-1]
        return optax.join_schedules(
            [optax.cosine_decay_schedule(cfg.lr, p, alpha=0.0)
             for p in periods], boundaries)
    raise ValueError(f"unknown scheduler {cfg.scheduler}")


def bind_schedule_steps(cfg: OptimConfig, total_steps: int,
                        steps_per_epoch: int = 0) -> OptimConfig:
    """Fill an unbound schedule (total_steps<=0) with the planned step count.

    Schedulers are declared span-relative (the reference interpolates
    ${trainer.max_epochs}); the pipeline binds them at dataset-bind time
    (run.py) and standalone scripts must bind them too or the schedule
    degrades to constant lr (_make_schedule). `steps_per_epoch` additionally
    binds the epoch-denominated schedulers (cosine_restart periods)."""
    import dataclasses

    if cfg.scheduler != "none":
        fills = {}
        if cfg.total_steps <= 0:
            fills["total_steps"] = max(0, total_steps)
        if cfg.steps_per_epoch <= 0 and steps_per_epoch > 0:
            fills["steps_per_epoch"] = steps_per_epoch
        if fills:
            return dataclasses.replace(cfg, **fills)
    return cfg


class HostLRScaleState(flax.struct.PyTreeNode):
    """Optimizer-state leaf holding a host-settable lr multiplier (the
    functional seat of ReduceLROnPlateau: the controller lives on the host,
    the scale rides in opt_state so it persists through jitted epochs AND
    checkpoints)."""

    scale: jax.Array


def host_lr_scale() -> optax.GradientTransformation:
    """Scale the final update by a host-settable factor (== scaling the lr,
    chained after the optimizer). See ReduceLROnPlateau/set_plateau_scale."""

    def init(params):
        del params
        return HostLRScaleState(scale=jnp.ones((), jnp.float32))

    def update(updates, state, params=None):
        del params
        return jax.tree.map(lambda u: u * state.scale, updates), state

    return optax.GradientTransformation(init, update)


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Host-side plateau controller, torch ReduceLROnPlateau semantics
    (mode min/max, threshold_mode=rel, no cooldown —
    config/scheduler/plateau.yaml). Feed one monitored value per epoch via
    `step()`; it returns the current lr scale (1.0 until the first
    reduction). The scale itself persists in opt_state (HostLRScaleState),
    so a preempted-and-resumed run keeps its reduced lr; the patience
    counter restarts with the process (epoch-grained, self-corrects)."""

    factor: float = 0.2
    patience: int = 10
    threshold: float = 1e-4
    min_scale: float = 0.0
    mode: str = "min"
    best: float = dataclasses.field(default=None, init=False)  # type: ignore
    num_bad: int = dataclasses.field(default=0, init=False)
    scale: float = dataclasses.field(default=1.0, init=False)

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        import math

        if math.isfinite(metric) and self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.scale = max(self.scale * self.factor, self.min_scale)
            self.num_bad = 0
        return self.scale


def get_plateau_scale(opt_state, label: str) -> float | None:
    """Read the HostLRScaleState scale of one multi_transform group, or
    None when that group's optimizer doesn't chain host_lr_scale. Used to
    re-seed the host plateau controller after a checkpoint restore — the
    restored opt_state carries the reduced scale, and a fresh controller
    starting at 1.0 would otherwise JUMP the lr back up on its first
    reduction (max(1.0*factor, min) > restored scale)."""
    leaves = [
        s for s in jax.tree_util.tree_leaves(
            opt_state.inner_states[label],
            is_leaf=lambda s: isinstance(s, HostLRScaleState))
        if isinstance(s, HostLRScaleState)
    ]
    return float(leaves[0].scale) if leaves else None


def set_plateau_scale(opt_state, scale: float, label: str | None = None):
    """Write `scale` into every HostLRScaleState leaf (one multi_transform
    group when `label` is given, all groups otherwise). Groups whose
    optimizer doesn't chain host_lr_scale (scheduler != plateau) have no
    such leaf and are untouched. Returns a new opt_state pytree."""

    def is_leaf(s):
        return isinstance(s, HostLRScaleState)

    def repl(s):
        if is_leaf(s):
            return HostLRScaleState(
                scale=jnp.asarray(scale, jnp.float32))
        return s

    if label is None:
        return jax.tree_util.tree_map(repl, opt_state, is_leaf=is_leaf)
    inner = dict(opt_state.inner_states)
    inner[label] = jax.tree_util.tree_map(repl, inner[label],
                                          is_leaf=is_leaf)
    return opt_state._replace(inner_states=inner)


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    lr = _make_schedule(cfg)
    if cfg.mode == "adam":
        opt = optax.adam(lr)
    elif cfg.mode == "adamw":
        opt = optax.adamw(lr, weight_decay=cfg.weight_decay)
    elif cfg.mode == "sgd":
        opt = optax.sgd(lr, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.mode}")
    if cfg.weight_decay and cfg.mode != "adamw":
        # torch-style coupled L2: the reference forwards weight_decay to
        # torch.optim.Adam/SGD (helpers.py:553-568), which adds wd*param to
        # the gradient before the update — add_decayed_weights BEFORE the
        # optimizer transform reproduces that (decoupled decay is adamw)
        opt = optax.chain(optax.add_decayed_weights(cfg.weight_decay), opt)
    if cfg.scheduler == "plateau":
        # scaling the post-optimizer update == scaling the lr for every
        # supported optimizer (the update is linear in lr)
        opt = optax.chain(opt, host_lr_scale())
    return opt


def _param_label(path) -> str:
    keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if any(k == "quantiles" for k in keys):
        return "coder"
    if any(k == "online_evaluator" for k in keys):
        return "online"
    return "main"


def make_tx(params, main: OptimConfig, online: OptimConfig | None = None,
            coder: OptimConfig | None = None,
            frozen_paths: tuple = ()) -> optax.GradientTransformation:
    """3-group optimizer (+ optional frozen subtrees).

    `frozen_paths`: path-key names whose subtree gets zero updates — the
    functional equivalent of the reference's `Freezer` callback
    (callbacks.py:503-531) used for staggered/finetune training (e.g.
    `("p_ZlX",)` freezes the encoder).
    """

    def label(path, _):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any(k in frozen_paths for k in keys):
            return "frozen"
        return _param_label(path)

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.multi_transform(
        {
            "main": make_optimizer(main),
            "online": make_optimizer(online or main),
            "coder": make_optimizer(coder or main),
            "frozen": optax.set_to_zero(),
        },
        labels)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, model, sample_batch, rng, main: OptimConfig,
               online: OptimConfig | None = None,
               coder: OptimConfig | None = None, frozen_paths: tuple = ()):
        x, y, aux = sample_batch
        init_rng, step_rng = jax.random.split(rng)
        # 'dropout' stream for archs with dropout_p > 0; derived by fold_in
        # so the 'params' stream (and every existing init) is unchanged
        variables = model.init(
            {"params": init_rng, "dropout": jax.random.fold_in(init_rng, 1)},
            x, y, aux, training=True, step=0, rng=step_rng)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = make_tx(params, main, online, coder, frozen_paths)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   apply_fn=model.apply, tx=tx)


@partial(jax.jit, donate_argnums=(0,))
def train_step(state: TrainState, batch, rng):
    """One fused RD + online + coder update."""
    return _train_step_inner(state, batch, rng)


def make_generative_epoch(sample_fn, n_steps: int, data_sharding=None):
    """Fuse data generation + n_steps updates into ONE jitted scan.

    `sample_fn(key) -> batch` generates a batch on device (e.g.
    `data.banana.device_sample_batch`). For generative/in-memory sources
    this removes all host->device traffic and per-step dispatch latency —
    the whole epoch is a single XLA program (SURVEY.md §5.7 dataset-axis
    scaling applied to training).

    Returns ``(state, logs)`` where each log metric is stacked over the
    epoch with shape ``(n_steps,)`` — per-step train curves at the same
    granularity as the reference's per-step Lightning logging (a few KB of
    scalars per epoch; the caller subsamples/averages for its logger).

    `data_sharding`: optional `NamedSharding` pinning each generated batch
    to the data mesh so the scan trains data-parallel (XLA otherwise
    replicates the generated batch when params are replicated).
    """

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(state: TrainState, rng):
        def body(state, key):
            k_data, k_step = jax.random.split(key)
            batch = sample_fn(k_data)
            if data_sharding is not None:
                batch = jax.lax.with_sharding_constraint(
                    batch, jax.tree.map(lambda _: data_sharding, batch))
            state, logs = _train_step_inner(state, batch, k_step)
            return state, logs
        keys = jax.random.split(rng, n_steps)
        state, logs = jax.lax.scan(body, state, keys)
        return state, logs

    return epoch


def _train_step_inner(state: TrainState, batch, rng):
    x, y, aux = batch

    def loss_fn(params):
        variables = {"params": params}
        mutable = []
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"]
        out, new_model_state = state.apply_fn(
            variables, x, y, aux, training=True, step=state.step, rng=rng,
            rngs={"dropout": jax.random.fold_in(rng, 1)}, mutable=mutable)
        loss, logs = out
        return loss, (logs, new_model_state)

    (loss, (logs, new_model_state)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_bs = new_model_state.get("batch_stats", state.batch_stats)
    return state.replace(step=state.step + 1, params=params,
                         batch_stats=new_bs, opt_state=opt_state), logs


@partial(jax.jit, static_argnames=("is_rate_only",))
def eval_step(state: TrainState, batch, rng=None, is_rate_only: bool = False):
    x, y, aux = batch
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    loss, logs = state.apply_fn(
        variables, x, y, aux, training=False, step=state.step, rng=rng,
        method="step", is_rate_only=is_rate_only)
    return loss, logs
