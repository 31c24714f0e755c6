"""Hub usage demo — the reference's `Hub.ipynb` flow.

Reference protocol (notebooks/Hub.ipynb; hubconf.py):

    compressor, transform = torch.hub.load('YannDubs/lossyless',
                                           'clip_compressor_b005')
    rate, enc_speed = compressor.compress_dataset(stl10_test, 'stl10.bin', Y)
    Z, Y = compressor.decompress_dataset('stl10.bin', Y)   # 1506 bits/img
    LinearSVC(C=7e-3).fit(Z_train, Y_train)                # 98.65%

Here the same surface, TPU-native:

    comp = clip_compressor_b005()        # published factorized_rate weights
    comp.compress_dataset(batches, 'stl10.bin', label_file='labels.npy')
    z, y = comp.decompress_dataset('stl10.bin', 'labels.npy')

This demo runs on random CLIP weights (zero-egress build environment) over
synthetic STL10-shaped uint8 images — the bitstream format, framing and
round-trip are exactly the deployment path; swap in a real OpenAI state
dict via `load_pretrained(clip_state_dict=...)` for real embeddings.

Run: `python examples/hub_demo.py` (CPU ok, slow ViT; TPU fast).
"""

import tempfile
from pathlib import Path

import numpy as np

from lossyless_tpu.hub import clip_compressor_b005


def main(n_images=64, batch=16):
    # raw_input_hw: raw STL10-native 96px uint8 crosses the host->device
    # boundary (27 KB/img); resize+normalize fuse into the device program
    comp = clip_compressor_b005(raw_input_hw=(96, 96))

    rng = np.random.default_rng(0)
    xs = rng.integers(0, 256, (n_images, 96, 96, 3), dtype=np.uint8)
    ys = rng.integers(0, 10, n_images)
    batches = ((xs[i:i + batch], ys[i:i + batch])
               for i in range(0, n_images, batch))

    with tempfile.TemporaryDirectory() as td:
        f, lab = Path(td) / "demo.bin", Path(td) / "labels.npy"
        rate, enc_speed = comp.compress_dataset(batches, f, label_file=lab)
        z, y = comp.decompress_dataset(f, lab)

    assert z.shape == (n_images, 512) and (y == ys).all()
    print(f"round-trip OK: {rate:.1f} bits/img, z {z.shape}")
    return rate, z, y


if __name__ == "__main__":
    main()
