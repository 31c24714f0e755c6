"""Data-parallel sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lossyless_tpu.core.mesh import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_contrastive_loss_matches_single_device():
    """Global-batch InfoNCE under a sharded batch == single-device values.

    This is the invariant the reference needed a custom autograd all-gather
    for (helpers.py:873-893); with pjit the same global loss expression is
    numerically identical under any sharding.
    """
    from lossyless_tpu.compressors.distortions import (ContrastiveDistortion,
                                                       DistortionConfig)

    cfg = DistortionConfig(mode="contrastive", is_project=False,
                           is_train_temperature=False, temperature=0.1)
    model = ContrastiveDistortion(cfg)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    z_pos = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    variables = model.init(jax.random.key(0), z, z_pos)

    def loss(z, z_pos):
        d, _ = model.apply(variables, z, z_pos)
        return d

    single = jax.jit(loss)(z, z_pos)

    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P("data"))
    zs = jax.device_put(z, sh)
    zps = jax.device_put(z_pos, sh)
    sharded = jax.jit(loss)(zs, zps)

    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_train_step_grads_match_single_device():
    """DP-sharded training step produces the same update as unsharded."""
    from lossyless_tpu.compressors.compressor import (
        CompressorConfig, EncoderConfig, LearnableCompressor, LossConfig,
        OnlineEvalConfig)
    from lossyless_tpu.compressors.distortions import DistortionConfig
    from lossyless_tpu.compressors.rates import RateConfig
    from lossyless_tpu.train.state import OptimConfig, TrainState, train_step

    cfg = CompressorConfig(
        encoder=EncoderConfig(arch="mlp", z_dim=4,
                              arch_kwargs=dict(hid_dim=16)),
        rate=RateConfig(mode="H_factorized"),
        distortion=DistortionConfig(mode="direct", data_mode="distribution",
                                    is_classification=False,
                                    arch_kwargs=dict(hid_dim=16)),
        online=OnlineEvalConfig(is_online=False),
        loss=LossConfig(beta=0.1, beta_anneal="constant"),
        in_shape=(2,), target_shape=1, aux_shape=2,
    )
    model = LearnableCompressor(cfg)
    rng = np.random.default_rng(1)
    batch = (rng.normal(size=(16, 2)).astype(np.float32),
             rng.normal(size=(16, 1)).astype(np.float32),
             rng.normal(size=(16, 2)).astype(np.float32))

    state0 = TrainState.create(model, batch, jax.random.key(0),
                               main=OptimConfig(lr=1e-3))
    s_single, logs_single = train_step(state0, batch, jax.random.key(1))

    mesh = make_mesh(8)
    state1 = TrainState.create(model, batch, jax.random.key(0),
                               main=OptimConfig(lr=1e-3))
    state1 = jax.device_put(state1, NamedSharding(mesh, P()))
    sharded_batch = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch)
    s_shard, logs_shard = train_step(state1, sharded_batch, jax.random.key(1))

    np.testing.assert_allclose(float(logs_single["loss"]),
                               float(logs_shard["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s_single.params)
    l2 = jax.tree_util.tree_leaves(s_shard.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
