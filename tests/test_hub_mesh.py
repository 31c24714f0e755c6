"""Mesh-sharded hub compressor: dataset-axis scaling over a data mesh.

The reference streams dataset compression serially through one GPU
(`/root/reference/hub/compressor.py:186-189`). Here `ClipCompressor(mesh=...)`
shards each batch over the mesh's "data" axis (SURVEY.md §5.7 dataset-axis
scaling); this test pins that the sharded path emits byte-identical streams
to the single-device path on the 8-device virtual CPU mesh.
"""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lossyless_tpu.core.mesh import make_mesh
from lossyless_tpu.hub.compressor import ClipCompressor
from lossyless_tpu.hub.load_reference import load_factorized_rate


@pytest.fixture(scope="module")
def rate_weights():
    return load_factorized_rate("b005")


def _small_compressor(rate_weights, mesh=None):
    from lossyless_tpu.nn.vit import VisionTransformer

    eb_params, scaling, biasing = rate_weights
    tiny = VisionTransformer(patch_size=32, width=64, layers=2, heads=2,
                             out_dim=512, dtype=jnp.float32)
    return ClipCompressor(eb_params, scaling, biasing, clip_params=None,
                          dtype=jnp.float32, seed=0, mesh=mesh, model=tiny)


def test_sharded_streams_match_single_device(rate_weights, tmp_path):
    mesh = make_mesh(8)
    comp_1 = _small_compressor(rate_weights)
    comp_8 = _small_compressor(rate_weights, mesh=mesh)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.5, (16, 224, 224, 3)).astype(np.float32)

    s1 = comp_1.compress(x)
    s8 = comp_8.compress(x)
    assert len(s1) == len(s8) == 16
    assert all(a == b for a, b in zip(s1, s8))

    # features path too
    f1 = np.asarray(comp_1(x))
    f8 = np.asarray(comp_8(x))
    np.testing.assert_allclose(f1, f8, rtol=1e-5, atol=1e-5)


def test_sharded_compress_dataset_roundtrip(rate_weights, tmp_path):
    mesh = make_mesh(8)
    comp = _small_compressor(rate_weights, mesh=mesh)
    rng = np.random.default_rng(1)

    def batches():
        for _ in range(2):
            x = rng.normal(0, 0.5, (8, 224, 224, 3)).astype(np.float32)
            y = rng.integers(0, 10, 8)
            yield x, y

    ds = tmp_path / "ds.bin"
    lbl = tmp_path / "lbl.npy"
    rate, _ = comp.compress_dataset(batches(), ds, label_file=lbl,
                                    is_info=False)
    z, y = comp.decompress_dataset(ds, lbl, is_info=False)
    assert z.shape == (16, 512)
    assert y.shape == (16,)
    assert rate > 0


def test_sharded_raw_input_and_ragged_batch(rate_weights):
    """mesh + raw_input_hw + a batch NOT divisible by the mesh: the fused
    device preprocess runs per-shard under shard_map, padded rows are
    dropped, and streams match the single-chip raw path exactly."""
    from lossyless_tpu.nn.vit import VisionTransformer

    eb_params, scaling, biasing = rate_weights
    tiny = VisionTransformer(patch_size=32, width=64, layers=2, heads=2,
                             out_dim=512, dtype=jnp.float32)
    mesh = make_mesh(8)
    kw = dict(clip_params=None, dtype=jnp.float32, seed=0, model=tiny,
              raw_input_hw=(96, 96))
    comp_1 = ClipCompressor(eb_params, scaling, biasing, **kw)
    comp_8 = ClipCompressor(eb_params, scaling, biasing, mesh=mesh, **kw)

    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (11, 96, 96, 3)).astype(np.uint8)  # ragged

    s1 = comp_1.compress(raw)
    s8 = comp_8.compress(raw)
    assert len(s1) == len(s8) == 11
    assert all(a == b for a, b in zip(s1, s8))

    f1 = np.asarray(comp_1(raw))
    f8 = np.asarray(comp_8(raw))
    assert f1.shape == f8.shape == (11, 512)
    np.testing.assert_allclose(f1, f8, rtol=1e-5, atol=1e-5)
