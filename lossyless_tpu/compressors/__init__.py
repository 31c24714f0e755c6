from .classical import ClassicalCompressor
from .compressor import (CompressorConfig, EncoderConfig, LearnableCompressor,
                         LossConfig, OnlineEvalConfig)
from .distortions import DistortionConfig, make_distortion_estimator
from .rates import (FactorizedCoder, HyperpriorCoder, RateConfig,
                    SpatialHyperpriorCoder, make_rate_estimator)

__all__ = ["ClassicalCompressor", "CompressorConfig", "EncoderConfig",
           "LearnableCompressor", "LossConfig", "OnlineEvalConfig",
           "DistortionConfig", "make_distortion_estimator", "FactorizedCoder",
           "HyperpriorCoder", "RateConfig", "SpatialHyperpriorCoder",
           "make_rate_estimator"]
