"""Conditional distributions for the encoder p(Z|X).

Functional equivalents of `/root/reference/lossyless/distributions.py`:
`Deterministic` (Delta) and `DiagGaussian` families built from the encoder's
sufficient-statistics output, plus the unit-Gaussian marginal and the KL
needed by the MI rate estimator.

Distributions are frozen dataclasses of arrays (pytrees), so they trace
cleanly through jit and can be `stop_gradient`-ed as a whole (the reference's
`detach(is_grad_flow=True)` trick, rates.py:136-144, becomes
`jax.tree.map(jax.lax.stop_gradient, dist)`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

MIN_STD = 1e-5  # reference distributions.py:116


@register_pytree_node_class
@dataclass(frozen=True)
class Deterministic:
    """Delta distribution (deterministic encoder). Event dim = last axis."""

    loc: jax.Array

    n_param = 1

    def rsample(self, key=None):
        return self.loc

    @property
    def mean(self):
        return self.loc

    def log_prob(self, z):
        # Delta log-prob as in reference helpers.py:338-392: 0 at the atom
        return jnp.where(
            jnp.all(z == self.loc, axis=-1), 0.0, -jnp.inf)

    def entropy(self):
        return jnp.zeros(self.loc.shape[:-1])

    def tree_flatten(self):
        return (self.loc,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@register_pytree_node_class
@dataclass(frozen=True)
class DiagGaussian:
    """Diagonal Gaussian; scale from softplus(raw) + MIN_STD."""

    loc: jax.Array
    scale: jax.Array

    n_param = 2

    def rsample(self, key):
        eps = jax.random.normal(key, self.loc.shape, self.loc.dtype)
        return self.loc + self.scale * eps

    @property
    def mean(self):
        return self.loc

    def log_prob(self, z):
        var = self.scale ** 2
        lp = -0.5 * ((z - self.loc) ** 2 / var + jnp.log(2 * math.pi * var))
        return lp.sum(-1)

    def entropy(self):
        return (0.5 * jnp.log(2 * math.pi * math.e * self.scale ** 2)).sum(-1)

    def tree_flatten(self):
        return (self.loc, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def from_suff_param(family: str, suff_param: jax.Array):
    """Build the family from concatenated sufficient statistics (B, z*p).

    Mirrors `Distributions.from_suff_param` (distributions.py:89-97): the
    channel layout is interleaved (z p), i.e. params per dim are contiguous.
    """
    if family == "deterministic":
        return Deterministic(suff_param)
    if family == "diaggaussian":
        b = suff_param.shape[0]
        s = suff_param.reshape(b, -1, 2)
        loc, log_var = s[..., 0], s[..., 1]
        scale = jax.nn.softplus(log_var) + MIN_STD
        return DiagGaussian(loc, scale)
    raise ValueError(f"unknown family={family}")


def n_suff_params(family: str) -> int:
    return {"deterministic": 1, "diaggaussian": 2}[family]


def detach(dist):
    """Stop gradients through all distribution parameters.

    The reference's `is_grad_flow=True` variant only adds `+ 0 * param`
    to keep torch autograd graphs alive (rates.py:136-144) — a no-op under
    JAX's trace-based autodiff, so there is no parameter here.
    """
    return jax.tree.map(jax.lax.stop_gradient, dist)


def kl_unit_gaussian(p: DiagGaussian) -> jax.Array:
    """KL[p || N(0, I)] per-sample (sums over event dim)."""
    var = p.scale ** 2
    kl = 0.5 * (var + p.loc ** 2 - 1.0 - jnp.log(var))
    return kl.sum(-1)


def kl_divergence(p, q_loc, q_scale, z_samples=None):
    """E[KL[p || N(q_loc, q_scale)]]; MC fallback for Delta p via z_samples.

    Mirrors reference helpers.py:226-244: analytic KL for Gaussian p, and a
    single-sample cross-entropy estimate for deterministic p.
    """
    if isinstance(p, DiagGaussian):
        var_p, var_q = p.scale ** 2, q_scale ** 2
        kl = 0.5 * (jnp.log(var_q / var_p) +
                    (var_p + (p.loc - q_loc) ** 2) / var_q - 1.0)
        return kl.sum(-1)
    # Delta p: KL = -H[p] - E_p[log q] = -log q(z)   (H[Delta]=0)
    z = z_samples if z_samples is not None else p.rsample()
    var_q = q_scale ** 2
    lp = -0.5 * ((z - q_loc) ** 2 / var_q + jnp.log(2 * math.pi * var_q))
    return -lp.sum(-1)
