from . import entropy_bottleneck, gaussian_conditional
from .bitstream import read_dataset, write_dataset
from .rans import RansCodec, pmf_to_quantized_cdf

__all__ = ["entropy_bottleneck", "gaussian_conditional", "read_dataset",
           "write_dataset", "RansCodec", "pmf_to_quantized_cdf"]
