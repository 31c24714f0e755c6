"""Hub entry points — the reference's ``torch.hub`` packaging surface.

The reference publishes its flagship models through ``hubconf.py``
(`/root/reference/hubconf.py:22-52`): ``torch.hub.load(repo,
'clip_compressor_b005')`` returns a ``(compressor, transform)`` pair, where
``transform`` drops into a torchvision pipeline (resize→224, CLIP-normalize,
to-tensor). This module is the same contract for the JAX framework: import
it (or point a hub-style loader at the repo root) and call the entry point.

    from hubconf import clip_compressor_b005
    compressor, transform = clip_compressor_b005()
    x = transform([pil_image])          # (1, 224, 224, 3) float32, normalized
    byte_strings = compressor.compress(x)

``transform`` accepts an iterable of PIL Images / HWC uint8 arrays of any
size and returns the normalized NHWC float batch ``compressor`` consumes —
the exact computation of the reference's per-image transform, batched and
thread-parallel (it rides the shared decode pool in ``data/loader.py``).

Rate-model weights (entropy bottleneck + feature affine) come from the
published ``beta{β}_factorized_rate.pt`` checkpoints when present on disk;
pass ``clip_state_dict=`` to load real CLIP tower weights (zero-egress
environments fall back to random tower init, which preserves every shape
and code path).
"""

from __future__ import annotations

# torch.hub-style dependency list; torch is required host-side (loading the
# published .pt rate weights + the default compressai-fp32 table build)
dependencies = ["jax", "flax", "numpy", "torch"]


def _load(beta: str, pretrained: bool, **kwargs):
    from lossyless_tpu.hub.compressor import load_pretrained
    from lossyless_tpu.nn.vit import pil_clip_preprocess

    if not pretrained:
        raise ValueError(
            "pretrained=False is not a published configuration; the hub "
            "models ship trained rate weights (reference hubconf.py:22-52)")
    compressor = load_pretrained(beta, **kwargs)
    return compressor, pil_clip_preprocess


def clip_compressor_b001(pretrained: bool = True, **kwargs):
    """CLIP compressor, beta=0.01 (highest rate / lowest distortion).

    Returns ``(compressor, transform)`` — reference hubconf.py:33-41.
    """
    return _load("b001", pretrained, **kwargs)


def clip_compressor_b005(pretrained: bool = True, **kwargs):
    """CLIP compressor, beta=0.05 — the headline ~1.5 kbit/img model.

    Returns ``(compressor, transform)`` — reference hubconf.py:22-30.
    """
    return _load("b005", pretrained, **kwargs)


def clip_compressor_b01(pretrained: bool = True, **kwargs):
    """CLIP compressor, beta=0.1 (lowest rate).

    Returns ``(compressor, transform)`` — reference hubconf.py:44-52.
    """
    return _load("b01", pretrained, **kwargs)
