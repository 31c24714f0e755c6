"""Classical codec baselines: JPEG / WebP / PNG / Identity.

Equivalent of `/root/reference/lossyless/classical_compressors.py`: the same
evaluation-only interface as the learnable compressor — compress a batch of
images with a standard codec, report rate (bpp / bits) and distortion
(MSE / PSNR) against the originals. Host-side via Pillow (libjpeg/libwebp/
zlib are already native C); not a TPU hot path.
"""

from __future__ import annotations

import dataclasses
import io
import time

import numpy as np
from PIL import Image

from ..train.metrics import MetricAccumulator, namespaced


@dataclasses.dataclass
class ClassicalCompressor:
    """`mode` in {jpeg, webp, png, identity}; `quality` for lossy modes."""

    mode: str = "jpeg"
    quality: int = 95

    def _codec_args(self):
        if self.mode == "jpeg":
            return dict(format="JPEG", quality=self.quality)
        if self.mode == "webp":
            return dict(format="WEBP", quality=self.quality)
        if self.mode == "png":
            return dict(format="PNG")
        raise ValueError(f"unknown mode {self.mode}")

    def compress_one(self, img_uint8: np.ndarray) -> bytes:
        if self.mode == "identity":
            return img_uint8.tobytes()
        pil = Image.fromarray(img_uint8.squeeze())
        with io.BytesIO() as f:
            pil.save(f, **self._codec_args())
            return f.getvalue()

    def decompress_one(self, data: bytes, shape) -> np.ndarray:
        if self.mode == "identity":
            return np.frombuffer(data, np.uint8).reshape(shape)
        with io.BytesIO(data) as f:
            img = Image.open(f)
            # codecs without grayscale support (WebP) decode to RGB;
            # convert back to the expected channel count
            if shape[-1] == 1 and img.mode != "L":
                img = img.convert("L")
            elif shape[-1] == 3 and img.mode != "RGB":
                img = img.convert("RGB")
            arr = np.asarray(img)
        return arr.reshape(shape)

    def batch_run(self, x_uint8: np.ndarray) -> tuple[np.ndarray, dict]:
        """Compress+decompress a uint8 NHWC batch; return (x_hat, logs).

        Mirrors `PillowCodec.batch_run` (classical_compressors.py:27-64):
        logs rate (bpp, n_bits) and distortion (mse, psnr) plus codec times.
        """
        b, h, w, c = x_uint8.shape
        x_hat = np.empty_like(x_uint8)
        n_bytes = 0
        t_enc = t_dec = 0.0
        for i in range(b):
            t0 = time.time()
            data = self.compress_one(x_uint8[i])
            t_enc += time.time() - t0
            n_bytes += len(data)
            t0 = time.time()
            x_hat[i] = self.decompress_one(data, (h, w, c))
            t_dec += time.time() - t0

        xf = x_uint8.astype(np.float32) / 255.0
        xhf = x_hat.astype(np.float32) / 255.0
        mse = float(((xf - xhf) ** 2).mean())
        psnr = float(10 * np.log10(1.0 / max(mse, 1e-12)))
        logs = {
            "n_bits": 8.0 * n_bytes / b,
            "bpp": 8.0 * n_bytes / (b * h * w),
            "mse": mse,
            "psnr": psnr,
            "distortion": mse,
            "rate": 8.0 * n_bytes / b,
            "compress_time": t_enc / b,
            "receiver_time": t_dec / b,
        }
        return x_hat, logs

    def evaluate(self, batches, stage: str = "feat") -> dict:
        """Test-only evaluation over (x, y, aux) batches (uint8 or [0,1])."""
        acc = MetricAccumulator()
        for x, _, __ in batches:
            x = np.asarray(x)
            if x.dtype != np.uint8:
                x = (np.clip(x, 0, 1) * 255).astype(np.uint8)
            _, logs = self.batch_run(x)
            acc.update(logs, weight=len(x))
        return namespaced(acc.means(), "test", stage)


def get_classical_compressor(mode: str, **kwargs) -> ClassicalCompressor:
    return ClassicalCompressor(mode=mode, **kwargs)
