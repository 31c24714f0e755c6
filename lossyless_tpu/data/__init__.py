from .banana import BananaDataset, device_sample_batch
from .features import FeaturesDataset
from .images import ImageDataset, get_datamodule, load_image_folder

__all__ = ["BananaDataset", "device_sample_batch", "FeaturesDataset",
           "ImageDataset", "get_datamodule", "load_image_folder"]
