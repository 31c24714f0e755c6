"""Pallas TPU kernel: fused quantize + factorized-prior likelihood.

The entropy bottleneck's likelihood is a per-channel chain of tiny (<=3x3)
affine+tanh stages evaluated at z±0.5 (see `entropy_bottleneck.py`). XLA
lowers the reference formulation to a sequence of small batched matmuls with
channel-major layouts that waste MXU tiles; the arithmetic is really
*elementwise over (channel, batch)* with per-channel coefficients. This
kernel runs the whole chain in VPU registers over (channel-sublane,
batch-lane) tiles:

    grid = (C/8, B/128); block = (8, 128)
    per block: load z-tile + per-channel weight rows, unroll the K-layer
    chain for lower/upper endpoints, emit likelihood (and z_hat) in one pass.

Gradient support: `eb_likelihood_fused` has a custom VJP whose backward
recomputes through the reference jnp chain (cheap — the op is tiny relative
to the encoder) so training can use the kernel too.

Weights are passed pre-flattened per layer; `pack_weights` converts an
`entropy_bottleneck.init_params` pytree.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import entropy_bottleneck as eb

C_TILE = 8
B_TILE = 128


def pack_weights(params: dict):
    """Flatten the per-layer weights to (C, k) fp32 arrays for the kernel."""
    L = eb.n_layers(params)
    packed = []
    for i in range(L):
        m = params[f"matrix{i}"]  # (C, d_out, d_in)
        b = params[f"bias{i}"]    # (C, d_out, 1)
        c = m.shape[0]
        packed.append(m.reshape(c, -1).astype(jnp.float32))
        packed.append(b.reshape(c, -1).astype(jnp.float32))
        if i < L - 1:
            f = params[f"factor{i}"]
            packed.append(f.reshape(c, -1).astype(jnp.float32))
    return packed, _layer_dims(params)


def _layer_dims(params: dict):
    L = eb.n_layers(params)
    dims = []
    for i in range(L):
        c, d_out, d_in = params[f"matrix{i}"].shape
        dims.append((d_out, d_in))
    return tuple(dims)


def _chain(v, weight_tiles, dims):
    """Unrolled per-channel chain on a (C_TILE, B_TILE) value tile.

    `v` is a list of per-filter-component tiles (length d_in of the current
    layer); weight tiles are (C_TILE, k) refs already loaded.
    """
    L = len(dims)
    w = 0
    state = v  # list of (C_TILE, B_TILE) arrays, length = current dim
    for i, (d_out, d_in) in enumerate(dims):
        m = weight_tiles[w]; w += 1   # (C_TILE, d_out*d_in)
        b = weight_tiles[w]; w += 1   # (C_TILE, d_out)
        new_state = []
        for j in range(d_out):
            acc = b[:, j][:, None]
            for k in range(d_in):
                coeff = jax.nn.softplus(m[:, j * d_in + k])[:, None]
                acc = acc + coeff * state[k]
            new_state.append(acc)
        if i < L - 1:
            f = weight_tiles[w]; w += 1  # (C_TILE, d_out)
            new_state = [
                s + jnp.tanh(f[:, j])[:, None] * jnp.tanh(s)
                for j, s in enumerate(new_state)
            ]
        state = new_state
    return state[0]  # final dim is 1


def _kernel(dims, z_ref, *refs):
    *w_refs, lik_ref = refs
    v = z_ref[:]  # (C_TILE, B_TILE) channel-major values
    weights = [r[:] for r in w_refs]

    lower = _chain([v - 0.5], weights, dims)
    upper = _chain([v + 0.5], weights, dims)
    sign = -jnp.sign(lower + upper)
    lik = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
    lik_ref[:] = jnp.maximum(lik, eb.LIKELIHOOD_BOUND)


def _pad_to(x, mult, axis):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def eb_likelihood_fused(params: dict, z_cb: jax.Array) -> jax.Array:
    """Likelihood at (already quantized/noised) values; z_cb is (C, B)."""
    return _forward(params, z_cb)


def _forward(params: dict, z_cb: jax.Array) -> jax.Array:
    c, b = z_cb.shape
    packed, dims = pack_weights(params)
    zp = _pad_to(_pad_to(z_cb.astype(jnp.float32), C_TILE, 0), B_TILE, 1)
    cp, bp = zp.shape
    packed = [_pad_to(w, C_TILE, 0) for w in packed]

    grid = (cp // C_TILE, bp // B_TILE)
    in_specs = [pl.BlockSpec((C_TILE, B_TILE), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)]
    for w in packed:
        k = w.shape[1]
        in_specs.append(pl.BlockSpec((C_TILE, k), lambda i, j: (i, 0),
                                     memory_space=pltpu.VMEM))

    lik = pl.pallas_call(
        functools.partial(_kernel, dims),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((C_TILE, B_TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, bp), jnp.float32),
        interpret=jax.default_backend() == "cpu",  # CPU CI fallback
    )(zp, *packed)
    return lik[:c, :b]


def _fwd(params, z_cb):
    return _forward(params, z_cb), (params, z_cb)


def _bwd(res, g):
    params, z_cb = res

    # recompute through the reference jnp chain for gradients; use
    # lower_bound (NOT maximum) so floored likelihoods keep the
    # recover-direction gradient, matching eb.forward's semantics
    from ..core.math import lower_bound

    def ref_lik(params, z_cb):
        v = z_cb[:, None, :]  # (C, 1, B)
        lower = eb._logits_cumulative(params, v - 0.5, stop_gradient=False)
        upper = eb._logits_cumulative(params, v + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        lik = jnp.abs(jax.nn.sigmoid(sign * upper)
                      - jax.nn.sigmoid(sign * lower))
        return lower_bound(lik[:, 0, :], eb.LIKELIHOOD_BOUND)

    _, vjp = jax.vjp(ref_lik, params, z_cb)
    return vjp(g)


eb_likelihood_fused.defvjp(_fwd, _bwd)


def likelihood(params: dict, z: jax.Array) -> jax.Array:
    """Fused-kernel likelihood, floored at LIKELIHOOD_BOUND in-kernel.

    z: (batch, channels) -> likelihood (batch, channels). Rate math is
    unchanged vs `entropy_bottleneck.likelihood` + `lower_bound` (which
    every in-repo caller applies anyway), but raw values below the bound
    (~1e-9) come back as the bound itself rather than the exact
    probability — not a bit-exact drop-in at that boundary.
    """
    z_cb = jnp.transpose(z.astype(jnp.float32), (1, 0))
    lik = eb_likelihood_fused(params, z_cb)
    return jnp.transpose(lik, (1, 0))
