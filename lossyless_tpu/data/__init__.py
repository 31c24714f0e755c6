from .banana import BananaDataset, device_sample_batch
from .external import (CocoClipDataset, GalaxyZooDataset,
                       StreamingImageFolder)
from .features import FeaturesDataset
from .images import ImageDataset, get_datamodule, load_image_folder
from .ingest import (ingest_coco_clip, ingest_kaggle_galaxy, ingest_tfds,
                     parse_tf_example, read_tfrecord, write_tfrecord)

__all__ = ["BananaDataset", "device_sample_batch", "FeaturesDataset",
           "ImageDataset", "get_datamodule", "load_image_folder",
           "CocoClipDataset", "GalaxyZooDataset", "StreamingImageFolder",
           "ingest_tfds", "ingest_kaggle_galaxy", "ingest_coco_clip",
           "read_tfrecord", "write_tfrecord", "parse_tf_example"]
