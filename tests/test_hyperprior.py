"""Hyperprior rate estimator: forward stats + real two-stream coding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lossyless_tpu.coding import gaussian_conditional as gc
from lossyless_tpu.compressors.rates import (HRateHyperprior, HyperpriorCoder,
                                             RateConfig)


@pytest.fixture(scope="module")
def hyper():
    module = HRateHyperprior(16, RateConfig(mode="H_hyper", side_z_dim=10))
    z = jnp.asarray(np.random.default_rng(0).normal(0, 3, (32, 16)),
                    jnp.float32)
    variables = module.init(
        {"params": jax.random.key(0)}, z, None, training=True,
        rng=jax.random.key(1))
    return module, variables, z


def test_forward_rates_positive(hyper):
    module, variables, z = hyper
    z_hat, rates, logs = module.apply(variables, z, None, training=False)
    assert z_hat.shape == z.shape
    assert np.all(np.asarray(rates) > 0)
    # H(Z,S) = H(S) + H(Z|S)
    np.testing.assert_allclose(
        float(logs["H_q_Z"]), float(logs["H_q_S"]) + float(logs["H_q_ZlS"]),
        rtol=1e-5)


def test_gaussian_conditional_pmf():
    """Gaussian likelihood sums to ~1 over the integer grid."""
    grid = jnp.arange(-40, 41, dtype=jnp.float32)[:, None]
    lik = gc.likelihood(grid, jnp.full((1,), 2.5), jnp.full((1,), 0.3))
    assert abs(float(lik.sum()) - 1.0) < 1e-4


def test_build_indexes_matches_table():
    st = gc.default_scale_table()
    scales = jnp.asarray([0.01, 0.11, 0.2, 1.0, 255.0])
    idx = np.asarray(gc.build_indexes(scales, st))
    for s, i in zip(np.asarray(scales), idx):
        s_eff = max(s, st[0])
        assert st[i] >= s_eff - 1e-6            # table scale covers s
        if i > 0:
            assert st[i - 1] < s_eff + 1e-6     # smallest such entry
    # beyond-table scales saturate to the last entry
    assert int(gc.build_indexes(jnp.asarray([300.0]), st)[0]) == len(st) - 1


def test_two_stream_roundtrip(hyper):
    """compress->decompress must reproduce the eval-mode z_hat exactly."""
    module, variables, z = hyper
    coder = HyperpriorCoder(module, variables["params"],
                            variables.get("batch_stats"))
    streams = coder.compress(np.asarray(z))
    assert len(streams) == 2
    z_dec = coder.decompress(streams)

    z_hat_eval, _, _ = module.apply(variables, z, None, training=False)
    np.testing.assert_allclose(z_dec, np.asarray(z_hat_eval), atol=1e-4)

    # coded size should be in the ballpark of the theoretical rate
    _, rates, _ = module.apply(variables, z, None, training=False)
    theo_bits = float(np.mean(np.asarray(rates))) / np.log(2)
    actual_bits = 8 * (sum(len(s) for s in streams[0]) +
                       sum(len(s) for s in streams[1])) / len(z)
    assert actual_bits < theo_bits + 200  # rANS flush overhead bound
