"""Externally-ingested datasets: ImageNet, COCO-CLIP captions, Galaxy Zoo.

These read the on-disk layouts materialized by `data.ingest` (or by the
official distributions) *lazily* — paths are indexed at construction, jpegs
are decoded per batch by the `data.loader` thread pool on a prefetch thread
while the device computes the previous batch — because these datasets don't
fit the in-memory `ImageDataset` design (reference equivalents:
ImageNetDataset utils/data/images.py:676-731, CocoClipDataset :1261-1362,
GalaxyDataset :1137-1257; the reference's decode parallelism is the torch
DataLoader's 16 worker processes).

Contract: same as every datamodule here — `len()`, `spec`,
`batches(batch_size, n_epochs, seed) -> (x, y, aux)` float batches.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from .images import DATA_DIR, ImageSpec

IMAGENET_SPEC = ImageSpec("imagenet", (224, 224, 3), 1000,
                          ("hflip", "resize_crop", "color", "gray"))
COCO_SPEC = ImageSpec("coco_captions", (224, 224, 3), 1)
# the reference's galaxy equivalence set (config/data/galaxy.yaml:11)
GALAXY_ZOO_SPEC = ImageSpec("galaxy_zoo", (128, 128, 3), 37,
                            ("resize_crop", "D4_group", "color", "gray"))


def _load_jpeg_batch(paths, size) -> np.ndarray:
    # thread-pool decode (data.loader): a serial PIL loop here would starve
    # the chip — the reference decodes on 16 DataLoader workers
    # (hub/compressor.py:186-189); identical bytes at any worker count
    from .loader import decode_image_batch

    return decode_image_batch(paths, size)


@dataclasses.dataclass
class StreamingImageFolder:
    """Lazy class-per-subdir reader for datasets too large for memory.

    For ImageNet: prefers `<data_dir>/imagenet256` over `<data_dir>/imagenet`
    (reference images.py:686-695), and maps the test split to `val` since the
    real test labels were never released (:697-698).
    """

    name: str = "imagenet"
    split: str = "train"
    additional_target: str | None = "representative"
    data_dir: Path = DATA_DIR
    # device-side equivalence augmentations for train batches (None -> the
    # spec's set); the pipeline constructs eval splits with is_augment=False
    equivalence: tuple | None = None
    is_augment: bool = True

    def __post_init__(self):
        self.spec = IMAGENET_SPEC if self.name == "imagenet" \
            else dataclasses.replace(IMAGENET_SPEC, name=self.name)
        if self.equivalence is None:
            self.equivalence = self.spec.default_equivalence
        from .augmentations import build_augmenter

        self._augment = build_augmenter(self.equivalence)
        root = None
        if self.name == "imagenet":
            for cand in ("imagenet256", "imagenet"):
                if (Path(self.data_dir) / cand).exists():
                    root = Path(self.data_dir) / cand
                    break
            if root is None:
                raise FileNotFoundError(
                    f"neither imagenet256 nor imagenet found under "
                    f"{self.data_dir}; install manually (no public download)")
            split = "val" if self.split in ("test", "validation") else self.split
        else:
            root = Path(self.data_dir) / self.name
            split = self.split
        split_dir = root / split
        if not split_dir.exists():
            raise FileNotFoundError(split_dir)
        self.classes = sorted(d.name for d in split_dir.iterdir()
                              if d.is_dir())
        self.paths, targets = [], []
        for ci, cname in enumerate(self.classes):
            for f in sorted((split_dir / cname).iterdir()):
                if f.suffix.lower() in (".jpeg", ".jpg", ".png"):
                    self.paths.append(f)
                    targets.append(ci)
        self.targets = np.asarray(targets, np.int64)
        self.n_classes = max(len(self.classes), self.spec.n_classes)

    def __len__(self):
        return len(self.paths)

    @property
    def aux_shape(self):
        if self.additional_target == "target":
            return self.spec.n_classes
        return self.spec.shape

    def batches(self, batch_size: int, n_epochs: int = 1, seed: int = 0,
                shuffle: bool = True, drop_last: bool = True):
        """Prefetched batch stream: decode/augment of batch i+1 runs on a
        background thread while the consumer dispatches batch i (identical
        bytes to the inline generator — data.loader contract)."""
        from .loader import prefetch

        return prefetch(self._iter_batches(batch_size, n_epochs, seed,
                                           shuffle, drop_last))

    def _iter_batches(self, batch_size: int, n_epochs: int = 1, seed: int = 0,
                      shuffle: bool = True, drop_last: bool = True):
        import jax

        h, w, _ = self.spec.shape
        rng = np.random.default_rng(seed)
        key = jax.random.key(seed)
        n = len(self)
        for _ in range(n_epochs):
            order = rng.permutation(n) if shuffle else np.arange(n)
            stop = n - batch_size + 1 if drop_last else n
            for i in range(0, stop, batch_size):
                idx = order[i:i + batch_size]
                raw = _load_jpeg_batch([self.paths[j] for j in idx],
                                       (h, w)).astype(np.float32) / 255.0
                if self._augment is not None and self.is_augment:
                    key, k1 = jax.random.split(key)
                    x = self._augment(k1, raw)
                else:
                    x = raw
                y = self.targets[idx]
                at = self.additional_target
                if at in ("target", None):
                    aux = y.astype(np.float32)
                elif at == "input":
                    aux = x                      # the augmented view
                elif at == "representative":
                    aux = raw                    # un-augmented base image
                elif at == "equiv_x":
                    # an independent second draw from the equivalence class
                    key, k2 = jax.random.split(key)
                    aux = (self._augment(k2, raw)
                           if self._augment is not None and self.is_augment
                           else raw)
                else:
                    raise ValueError(f"unknown additional_target={at}")
                yield x, y, aux


@dataclasses.dataclass
class CocoClipDataset:
    """Ingested COCO captions: image x, positive aux = a caption feature.

    The equivalence class of an image is 'images described by the same
    caption' — `equiv_x` returns the CLIP text features of one of its
    captions, drawn at random per epoch (reference images.py:1341-1349).
    Targets are -1 (no labels, reference :1337-1339).
    """

    split: str = "train"
    data_dir: Path = DATA_DIR
    additional_target: str | None = "equiv_x"
    # Optional device-side equivalence augmentations (e.g. ("resize_crop",)).
    # Default OFF: the reference's coco recipe augments with resize+crop —
    # random 224px windows of the short-side-resized image — but ingestion
    # here materializes the center 224px square, so the faithful default is
    # the deterministic view; opt in via data_feat.kwargs.equivalence.
    equivalence: tuple | None = None
    is_augment: bool = True

    def __post_init__(self):
        self.spec = COCO_SPEC
        from .augmentations import build_augmenter

        self._augment = build_augmenter(self.equivalence)
        if self.split == "validation":  # no val split: fall back to train
            self.split = "train"        # (reference to_tfds_split, :855-860)
        split_dir = Path(self.data_dir) / "coco_captions" / self.split
        if not split_dir.exists():
            raise FileNotFoundError(
                f"{split_dir} missing; run data.ingest.ingest_coco_clip")
        self.split_dir = split_dir
        self.paths = sorted(split_dir.glob("*th_img.jpeg"),
                            key=lambda p: int(p.name.split("th")[0]))
        self._feat_dim = None

    def __len__(self):
        return len(self.paths)

    @property
    def feat_dim(self) -> int:
        if self._feat_dim is None:
            img = self.paths[0]
            f = np.load(img.with_name(
                img.name.replace("th_img.jpeg", "th_features.npy")))
            self._feat_dim = int(f.shape[-1])
        return self._feat_dim

    @property
    def aux_shape(self):
        return (self.feat_dim,)

    def batches(self, batch_size: int, n_epochs: int = 1, seed: int = 0,
                shuffle: bool = True, drop_last: bool = True):
        """Prefetched batch stream (see StreamingImageFolder.batches)."""
        from .loader import prefetch

        return prefetch(self._iter_batches(batch_size, n_epochs, seed,
                                           shuffle, drop_last))

    def _iter_batches(self, batch_size: int, n_epochs: int = 1, seed: int = 0,
                      shuffle: bool = True, drop_last: bool = True):
        import jax

        h, w, _ = self.spec.shape
        rng = np.random.default_rng(seed)
        key = jax.random.key(seed)
        n = len(self)
        for _ in range(n_epochs):
            order = rng.permutation(n) if shuffle else np.arange(n)
            stop = n - batch_size + 1 if drop_last else n
            for i in range(0, stop, batch_size):
                idx = order[i:i + batch_size]
                x = _load_jpeg_batch([self.paths[j] for j in idx],
                                     (h, w)).astype(np.float32) / 255.0
                if self._augment is not None and self.is_augment:
                    key, k1 = jax.random.split(key)
                    x = self._augment(k1, x)
                aux = np.empty((len(idx), self.feat_dim), np.float32)
                for r, j in enumerate(idx):
                    # derive the feature file from the IMAGE file's own
                    # index: positional pairing silently mismatches when
                    # on-disk indices are non-contiguous (partial ingest)
                    img = self.paths[j]
                    feats = np.load(img.with_name(
                        img.name.replace("th_img.jpeg", "th_features.npy")))
                    aux[r] = feats[rng.integers(len(feats))]
                y = np.full((len(idx),), -1, np.int64)
                yield x, y, aux


@dataclasses.dataclass
class GalaxyZooDataset:
    """Ingested Galaxy Zoo: 37-task regression targets (reference
    images.py:1137-1257; target treated as regression, is_clf False)."""

    split: str = "train"
    data_dir: Path = DATA_DIR
    additional_target: str | None = "target"
    # equivalence augmentations applied on device per batch (None -> the
    # spec's reference set); the pipeline passes is_augment=False for eval
    equivalence: tuple | None = None
    is_augment: bool = True
    synthetic: bool = False
    synthetic_n: int = 2048
    seed: int = 0
    # training resolution (reference galaxy64/galaxy256 configs pass
    # dataset_kwargs.resolution; default 128 = config/data/galaxy.yaml);
    # jpegs are resized at load, so any ingested dump serves every size
    resolution: int = 0

    def __post_init__(self):
        self.spec = GALAXY_ZOO_SPEC
        if self.resolution:
            self.spec = dataclasses.replace(
                self.spec, shape=(self.resolution, self.resolution,
                                  self.spec.shape[2]))
        if self.equivalence is None:
            self.equivalence = self.spec.default_equivalence
        from .augmentations import build_augmenter

        self._augment = build_augmenter(self.equivalence)
        if self.split == "validation":  # no val split: fall back to train
            self.split = "train"
        root = Path(self.data_dir) / "galaxy"
        split_dir = root / self.split
        # an explicit synthetic=True always takes the synthetic path, even
        # when the real data dir exists (same contract as ImageDataset)
        if self.synthetic or not split_dir.exists():
            # deterministic synthetic fallback, same policy as the image
            # datasets (this environment has no kaggle egress); real data
            # materializes via data.ingest.ingest_kaggle_galaxy
            self.synthetic = True
            rng = np.random.default_rng(
                self.seed + (0 if self.split == "train" else 1))
            h, w, c = self.spec.shape
            self._synth_x = rng.uniform(
                0, 1, (self.synthetic_n, h, w, c)).astype(np.float32)
            t = rng.dirichlet(np.ones(37), self.synthetic_n)
            self.targets = t.astype(np.float32)
            self.paths = [None] * self.synthetic_n
            return
        self.split_dir = split_dir
        self.paths = sorted(split_dir.glob("*th_img.jpeg"),
                            key=lambda p: int(p.name.split("th")[0]))
        if self.split == "train":
            self.targets = np.load(root / "train_targets.npy")
        else:  # kaggle holds test labels back; ids used for submissions
            self.ids = np.load(root / f"{self.split}_ids.npy")
            self.targets = np.zeros((len(self.paths), 37), np.float32)

    def __len__(self):
        return len(self.paths)

    @property
    def aux_shape(self):
        # image-valued aux: "input"/"representative" (VAE/VIC
        # reconstruction, the neurips-final galaxy recipe) and "equiv_x"
        # (a second augmented view); the default "target" yields the 37
        # regression probabilities
        if self.additional_target in ("input", "representative", "equiv_x"):
            return self.spec.shape
        return 37

    def batches(self, batch_size: int, n_epochs: int = 1, seed: int = 0,
                shuffle: bool = True, drop_last: bool = True):
        """Prefetched batch stream (see StreamingImageFolder.batches)."""
        from .loader import prefetch

        return prefetch(self._iter_batches(batch_size, n_epochs, seed,
                                           shuffle, drop_last))

    def _iter_batches(self, batch_size: int, n_epochs: int = 1, seed: int = 0,
                      shuffle: bool = True, drop_last: bool = True):
        import jax

        h, w, _ = self.spec.shape
        rng = np.random.default_rng(seed)
        key = jax.random.key(seed)
        n = len(self)
        at = self.additional_target
        for _ in range(n_epochs):
            order = rng.permutation(n) if shuffle else np.arange(n)
            stop = n - batch_size + 1 if drop_last else n
            for i in range(0, stop, batch_size):
                idx = order[i:i + batch_size]
                if self.synthetic:
                    raw = self._synth_x[idx]
                else:
                    raw = _load_jpeg_batch([self.paths[j] for j in idx],
                                           (h, w)).astype(np.float32) / 255.0
                y = self.targets[idx].astype(np.float32)
                if self._augment is not None and self.is_augment:
                    key, k1 = jax.random.split(key)
                    x = self._augment(k1, raw)
                else:
                    x = raw
                # aux contract mirrors ImageDataset (images.py:377-397):
                # "input" = the augmented view (reconstruction target),
                # "representative" = the un-augmented base image,
                # "equiv_x" = an INDEPENDENT second augmented draw
                # (contrastive positive), target/None = regression targets
                if at == "input":
                    aux = x
                elif at == "representative":
                    aux = raw
                elif at == "equiv_x":
                    key, k2 = jax.random.split(key)
                    aux = (self._augment(k2, raw)
                           if self._augment is not None and self.is_augment
                           else raw)
                elif at in ("target", None):
                    aux = y.copy()
                else:
                    raise ValueError(f"unknown additional_target={at}")
                yield x, y, aux
