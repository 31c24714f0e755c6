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


def test_decompress_is_host_only(hyper, monkeypatch):
    """The receiver makes ZERO device dispatches (VERDICT r4 #3).

    The reference decodes CPU-only (README.md:64-66); on a tunneled chip a
    single dispatch costs more than the whole decode. Count both dispatch
    entry points — compiled calls (jit) and eager op-by-op
    (dispatch.apply_primitive) — across decompress.
    """
    import jax._src.dispatch as _dispatch
    import jax._src.pjit as _pjit

    module, variables, z = hyper
    coder = HyperpriorCoder(module, variables["params"],
                            variables.get("batch_stats"))
    streams = coder.compress(np.asarray(z))  # sender may use the device

    calls = []
    real_eager = _dispatch.apply_primitive
    real_pjit = _pjit._pjit_call_impl

    def count_eager(prim, *a, **k):
        calls.append(("eager", str(prim)))
        return real_eager(prim, *a, **k)

    def count_pjit(*a, **k):
        calls.append(("pjit", k.get("name", "?")))
        return real_pjit(*a, **k)

    monkeypatch.setattr(_dispatch, "apply_primitive", count_eager)
    monkeypatch.setattr(_pjit, "_pjit_call_impl", count_pjit)
    z_dec = coder.decompress(streams)
    assert calls == [], f"decompress dispatched to the device: {calls[:5]}"
    assert isinstance(z_dec, np.ndarray)

    z_hat_eval, _, _ = module.apply(variables, z, None, training=False)
    np.testing.assert_allclose(z_dec, np.asarray(z_hat_eval), atol=1e-4)


def test_spatial_decompress_is_host_only(monkeypatch):
    """Same zero-dispatch contract for the spatial coder (delegates to the
    inner HyperpriorCoder, so this pins the composition too)."""
    import jax._src.dispatch as _dispatch
    import jax._src.pjit as _pjit

    from lossyless_tpu.compressors.rates import (HRateHyperpriorSpatial,
                                                 SpatialHyperpriorCoder)

    module = HRateHyperpriorSpatial(64, 4, RateConfig(mode="H_spatial",
                                                      n_channels=4,
                                                      side_z_dim=3))
    z = jnp.asarray(np.random.default_rng(3).normal(0, 3, (6, 64)),
                    jnp.float32)
    variables = module.init({"params": jax.random.key(0)}, z, None,
                            training=True, rng=jax.random.key(1))
    coder = SpatialHyperpriorCoder(module, variables["params"],
                                   variables.get("batch_stats"))
    streams = coder.compress(np.asarray(z))

    calls = []
    real_eager = _dispatch.apply_primitive
    real_pjit = _pjit._pjit_call_impl
    monkeypatch.setattr(
        _dispatch, "apply_primitive",
        lambda prim, *a, **k: (calls.append(str(prim)),
                               real_eager(prim, *a, **k))[1])
    monkeypatch.setattr(
        _pjit, "_pjit_call_impl",
        lambda *a, **k: (calls.append("pjit"), real_pjit(*a, **k))[1])
    z_dec = coder.decompress(streams, batch_size=6)
    assert calls == [], f"decompress dispatched to the device: {calls[:5]}"
    assert z_dec.shape == (6, 64)
