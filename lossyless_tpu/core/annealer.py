"""Hyperparameter annealing as a pure function of the step counter.

Functional port of the reference's stateful `Annealer`
(/root/reference/lossyless/helpers.py:768-870): the value is computed from
`n_update_calls` (the global step), never from hidden mutable state, so it is
jit-compatible (the step is a traced scalar).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Annealer:
    initial_value: float
    final_value: float
    n_steps_anneal: int
    start_step: int = 0
    default: float | None = None
    mode: str = "geometric"  # {"linear","geometric","constant"}

    def __post_init__(self):
        if self.n_steps_anneal < 0:
            object.__setattr__(self, "n_steps_anneal", -self.n_steps_anneal)
            ini, fin = self.final_value, self.initial_value
            object.__setattr__(self, "initial_value", ini)
            object.__setattr__(self, "final_value", fin)
        if self.mode not in ("linear", "geometric", "constant"):
            raise ValueError(f"unknown mode {self.mode}")

    def __call__(self, step):
        """Value at `step` (python int or traced int32 scalar)."""
        if self.mode == "constant":
            return jnp.asarray(self.final_value, dtype=jnp.float32)

        default = self.initial_value if self.default is None else self.default
        t = jnp.asarray(step, dtype=jnp.float32) - self.start_step
        n = float(self.n_steps_anneal)

        if self.mode == "geometric":
            factor = (self.final_value / self.initial_value) ** (1.0 / n)
            annealing = self.initial_value * factor ** t
        else:  # linear
            delta = (self.final_value - self.initial_value) / n
            annealing = self.initial_value + delta * t

        value = jnp.where(t >= n, self.final_value, annealing)
        return jnp.where(t < 0, default, value).astype(jnp.float32)
