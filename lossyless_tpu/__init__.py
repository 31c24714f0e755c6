"""lossyless_tpu — TPU-native framework for lossy compression with lossless
prediction (Dubois et al., NeurIPS 2021).

A from-scratch JAX/XLA/Pallas redesign with the capabilities of the
reference PyTorch implementation (YannDubs/lossyless): task-specific
invariant compressors (encoder + learned rate model + distortion bound),
real rANS entropy coding (C++ host codec), a 3-stage experiment pipeline,
and a deployment CLIP compressor hub API.
"""

from .compressors.compressor import (CompressorConfig, EncoderConfig,
                                     LearnableCompressor, LossConfig,
                                     OnlineEvalConfig)
from .compressors.distortions import DistortionConfig
from .compressors.rates import RateConfig

__version__ = "0.1.0"

__all__ = [
    "CompressorConfig", "EncoderConfig", "LearnableCompressor", "LossConfig",
    "OnlineEvalConfig", "DistortionConfig", "RateConfig",
]
