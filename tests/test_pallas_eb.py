"""Fused Pallas entropy-bottleneck likelihood vs the reference jnp chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lossyless_tpu.coding import entropy_bottleneck as eb
from lossyless_tpu.coding import pallas_eb


@pytest.fixture(scope="module")
def setup():
    cfg = eb.EBConfig(channels=20, filters=(3, 3, 3), init_scale=10.0)
    params = eb.init_params(cfg, jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (50, 20)) * 5
    return params, z


def test_matches_reference(setup):
    params, z = setup
    ref = eb.likelihood(params, z)
    fused = pallas_eb.likelihood(params, z)  # interpret on CPU backend
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)


def test_grads_match_reference(setup):
    params, z = setup

    def loss_ref(p, z):
        return -jnp.log(eb.likelihood(p, z)).sum()

    def loss_fused(p, z):
        return -jnp.log(pallas_eb.likelihood(p, z)).sum()

    g_ref = jax.grad(loss_ref)(params, z)
    g_fused = jax.grad(loss_fused)(params, z)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_fused[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_nondivisible_shapes(setup):
    params, _ = setup
    z = jax.random.normal(jax.random.key(2), (13, 20)) * 3  # B not /128
    ref = eb.likelihood(params, z)
    fused = pallas_eb.likelihood(params, z)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_pallas_rate_estimator_matches_jnp():
    """HRateFactorizedPrior with eb_use_pallas=True trains identically."""
    from lossyless_tpu.compressors.rates import (HRateFactorizedPrior,
                                                 RateConfig)

    z = jax.random.normal(jax.random.key(0), (32, 20)) * 4
    m0 = HRateFactorizedPrior(20, RateConfig())
    m1 = HRateFactorizedPrior(20, RateConfig(eb_use_pallas=True))
    v = m0.init({"params": jax.random.key(1)}, z, None, training=True,
                rng=jax.random.key(2))

    out0 = m0.apply(v, z, None, training=False)
    out1 = m1.apply(v, z, None, training=False)
    np.testing.assert_allclose(np.asarray(out0[0]), np.asarray(out1[0]),
                               atol=1e-5)  # z_hat
    np.testing.assert_allclose(np.asarray(out0[1]), np.asarray(out1[1]),
                               rtol=1e-4, atol=1e-4)  # rates (nats)

    # gradients agree too (pallas VJP recomputes the reference chain)
    def loss(params, m):
        _, rates, _ = m.apply({"params": params}, z, None, training=True,
                              rng=jax.random.key(3))
        return rates.mean()

    g0 = jax.grad(lambda p: loss(p, m0))(v["params"])
    g1 = jax.grad(lambda p: loss(p, m1))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
