"""hubconf.py packaging surface — reference hubconf.py:22-52 parity."""

import sys
from pathlib import Path

import numpy as np
import pytest

# hubconf.py lives at the repo root (torch.hub contract), not in the package
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import hubconf  # noqa: E402


def test_dependencies_list():
    """torch.hub reads a module-level `dependencies` list (reference :1-7)."""
    assert isinstance(hubconf.dependencies, list)
    assert "jax" in hubconf.dependencies


@pytest.mark.parametrize("name", ["clip_compressor_b001",
                                  "clip_compressor_b005",
                                  "clip_compressor_b01"])
def test_entry_point_returns_pair(name):
    """Each entry point returns (compressor, transform) like the reference."""
    from lossyless_tpu.hub.compressor import ClipCompressor

    compressor, transform = getattr(hubconf, name)()
    assert isinstance(compressor, ClipCompressor)
    assert callable(transform)

    # the transform drops in for the reference's torchvision pipeline:
    # arbitrary-size PIL/uint8 -> (B, 224, 224, 3) normalized float batch
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (96, 128, 3), dtype=np.uint8),
            rng.integers(0, 256, (300, 40, 3), dtype=np.uint8)]
    batch = transform(imgs)
    assert batch.shape == (2, 224, 224, 3)
    assert batch.dtype == np.float32

    # decode path works without the (lazy) tower: the packaging surface is
    # usable end-to-end for a receiver with no accelerator
    sym = rng.integers(-20, 20, (4, compressor.z_dim)).astype(np.int32)
    streams = compressor.codec.encode_batch(sym, compressor.indexes)
    z_hat = compressor.decompress([bytes(s) for s in streams])
    assert z_hat.shape == (4, compressor.z_dim)


def test_pretrained_false_rejected():
    with pytest.raises(ValueError):
        hubconf.clip_compressor_b005(pretrained=False)
