"""Numerical primitives shared across the framework.

These are the JAX-native equivalents of small numeric utilities the reference
gets from torch/CompressAI (e.g. CompressAI's ``LowerBound`` straight-through
op used by the entropy models, reached via /root/reference/lossyless/rates.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BASE_LOG = 2  # all reported entropies are in bits (reference helpers.py:27)
LOG2 = 0.6931471805599453


@jax.custom_vjp
def lower_bound(x, bound):
    """`max(x, bound)` with a straight-through-ish gradient.

    The gradient passes when the input is above the bound, or when it is below
    but the gradient pushes it up (CompressAI's LowerBound convention) — this
    keeps likelihoods from collapsing to 0 while still letting them recover.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@jax.custom_vjp
def ste_round(x):
    """Round with a straight-through (identity) gradient."""
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


def standardized_cumulative(x):
    """CDF of the standard normal via erfc (numerically stable upper tail)."""
    return 0.5 * jax.scipy.special.erfc(-x * (2 ** -0.5))


def nats_to_bits(x):
    return x / LOG2
