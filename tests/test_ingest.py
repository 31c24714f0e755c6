"""Fixture-driven ingestion: tfds shards / kaggle galaxy / COCO-CLIP trees
materialize the folder layouts the datamodules read (reference
utils/data/images.py:735-865, 1137-1257, 1261-1362)."""

import io
import json

import numpy as np
import pytest
from PIL import Image

from lossyless_tpu.data.external import (CocoClipDataset, GalaxyZooDataset,
                                         StreamingImageFolder)
from lossyless_tpu.data.images import ImageDataset
from lossyless_tpu.data.ingest import (encode_tf_example, hash_tokenize,
                                       ingest_coco_clip, ingest_kaggle_galaxy,
                                       ingest_tfds, parse_tf_example,
                                       read_tfrecord, write_tfrecord)


def _jpeg_bytes(value, size=(40, 50)):
    buf = io.BytesIO()
    Image.fromarray(np.full((*size, 3), value, np.uint8)).save(buf, "JPEG")
    return buf.getvalue()


def test_tfrecord_example_roundtrip(tmp_path):
    examples = [
        {"image": _jpeg_bytes(10), "label": [3],
         "weights": [0.5, 1.5], "name": "a b"},
        {"image": _jpeg_bytes(200), "label": [-2]},
    ]
    path = tmp_path / "shard.tfrecord"
    write_tfrecord(path, [encode_tf_example(e) for e in examples])

    parsed = [parse_tf_example(p) for p in read_tfrecord(path)]
    assert parsed[0]["label"] == [3]
    assert parsed[1]["label"] == [-2]          # int64 sign round-trips
    assert parsed[0]["name"] == [b"a b"]
    np.testing.assert_allclose(parsed[0]["weights"], [0.5, 1.5])
    assert Image.open(io.BytesIO(parsed[0]["image"][0])).size == (50, 40)

    # CRC catches corruption
    raw = bytearray(path.read_bytes())
    raw[20] ^= 0xFF
    bad = tmp_path / "bad.tfrecord"
    bad.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="CRC"):
        list(read_tfrecord(bad))


def test_ingest_tfds_to_folder_and_dataset(tmp_path):
    shard = tmp_path / "pets-train.tfrecord-00000"
    recs = [encode_tf_example({"image": _jpeg_bytes(30 * i + 20),
                               "label": [i % 2]}) for i in range(6)]
    write_tfrecord(shard, recs)

    out = ingest_tfds([shard], "pets37", tmp_path / "data", "train",
                      label_names=["cat", "dog"], min_size=96)
    assert (out / "_exist_data.txt").exists()
    assert sorted(d.name for d in out.iterdir() if d.is_dir()) == \
        ["cat", "dog"]

    # loads through the standard datamodule (folder layout contract)
    ds = ImageDataset(name="pets37", split="train",
                      data_dir=tmp_path / "data", val_fraction=0)
    assert not ds.synthetic and len(ds) == 6
    x, y, aux = next(ds.batches(4, seed=0))
    assert x.shape == (4, 96, 96, 3)


def test_ingest_kaggle_galaxy(tmp_path):
    raw = tmp_path / "raw"
    (raw / "images_training_rev1").mkdir(parents=True)
    (raw / "images_test_rev1").mkdir()
    rng = np.random.default_rng(0)
    rows = ["GalaxyID," + ",".join(f"Class{i}" for i in range(37))]
    for gid in (100, 101, 102):
        Image.fromarray(rng.integers(0, 255, (300, 300, 3), np.uint8)) \
            .save(raw / "images_training_rev1" / f"{gid}.jpg")
        rows.append(f"{gid}," + ",".join(
            f"{v:.3f}" for v in rng.uniform(size=37)))
    Image.fromarray(rng.integers(0, 255, (300, 300, 3), np.uint8)) \
        .save(raw / "images_test_rev1" / "555.jpg")
    (raw / "training_solutions_rev1.csv").write_text("\n".join(rows))

    out = ingest_kaggle_galaxy(raw, tmp_path / "data", resolution=64)
    assert np.load(out / "train_targets.npy").shape == (3, 37)

    ds = GalaxyZooDataset(split="train", data_dir=tmp_path / "data")
    assert len(ds) == 3
    x, y, aux = next(ds.batches(2, seed=0))
    assert x.shape[1:] == (128, 128, 3) and y.shape == (2, 37)
    te = GalaxyZooDataset(split="test", data_dir=tmp_path / "data")
    assert list(te.ids) == [555]


def test_ingest_coco_clip(tmp_path):
    coco = tmp_path / "coco"
    (coco / "train2017").mkdir(parents=True)
    (coco / "annotations").mkdir()
    for i, img_id in enumerate((7, 9)):
        Image.fromarray(np.full((60, 80, 3), 90 * (i + 1), np.uint8)) \
            .save(coco / "train2017" / f"{img_id:012d}.jpg")
    meta = {
        "images": [{"id": 7, "file_name": f"{7:012d}.jpg"},
                   {"id": 9, "file_name": f"{9:012d}.jpg"}],
        "annotations": [
            {"image_id": 7, "caption": "a cat"},
            {"image_id": 7, "caption": "feline resting"},
            {"image_id": 9, "caption": "a dog"},
        ],
    }
    (coco / "annotations" / "captions_train2017.json").write_text(
        json.dumps(meta))

    def fake_encoder(texts):
        return np.full((len(texts), 16), float(len(texts)), np.float32)

    ingest_coco_clip(coco, tmp_path / "data", split="train",
                     text_encode_fn=fake_encoder, size=64)
    ds = CocoClipDataset(split="train", data_dir=tmp_path / "data")
    assert len(ds) == 2 and ds.feat_dim == 16
    x, y, aux = next(ds.batches(2, seed=0))
    assert x.shape == (2, 224, 224, 3)       # resized up to the CLIP spec
    assert aux.shape == (2, 16) and (y == -1).all()


def test_streaming_imagenet_layout(tmp_path):
    root = tmp_path / "imagenet256"
    for split in ("train", "val"):
        for wnid in ("n01440764", "n01443537"):
            d = root / split / wnid
            d.mkdir(parents=True)
            for i in range(2):
                Image.fromarray(np.full((64, 64, 3), 50 * i + 10, np.uint8)) \
                    .save(d / f"{wnid}_{i}.JPEG".lower())
    ds = StreamingImageFolder(name="imagenet", split="train",
                              data_dir=tmp_path)
    assert len(ds) == 4 and ds.classes == ["n01440764", "n01443537"]
    te = StreamingImageFolder(name="imagenet", split="test",
                              data_dir=tmp_path)          # maps to val
    assert len(te) == 4
    x, y, aux = next(ds.batches(4, seed=0, shuffle=False))
    assert x.shape == (4, 224, 224, 3) and set(np.asarray(y)) == {0, 1}


def test_hash_tokenize_contract():
    toks = hash_tokenize(["a cat sat", "dog"])
    assert toks.shape == (2, 77)
    assert (toks[:, 0] == 49406).all()            # <start>
    assert toks[0, 4] == 49407 and toks[1, 2] == 49407  # <end>
    assert (toks[0, 5:] == 0).all()               # padding
    # deterministic
    np.testing.assert_array_equal(toks, hash_tokenize(["a cat sat", "dog"]))


def test_pipeline_routes_external_datasets(tmp_path):
    """instantiate_datamodule resolves non-SPECS names via the registry and
    records the external dataset's shapes (aux = caption-feature dim)."""
    import json as _json

    coco = tmp_path / "coco"
    (coco / "train2017").mkdir(parents=True)
    (coco / "annotations").mkdir()
    Image.fromarray(np.full((60, 80, 3), 77, np.uint8)) \
        .save(coco / "train2017" / f"{1:012d}.jpg")
    (coco / "annotations" / "captions_train2017.json").write_text(
        _json.dumps({"images": [{"id": 1, "file_name": f"{1:012d}.jpg"}],
                     "annotations": [{"image_id": 1, "caption": "hi"}]}))
    ingest_coco_clip(coco, tmp_path / "data", split="train",
                     text_encode_fn=lambda t: np.zeros((len(t), 16),
                                                       np.float32))

    from lossyless_tpu.pipeline.config import DataConfig, ExperimentConfig
    from lossyless_tpu.pipeline.run import instantiate_datamodule

    cfg = ExperimentConfig()
    ds = instantiate_datamodule(
        cfg, DataConfig(name="coco_clip",
                        kwargs=dict(data_dir=tmp_path / "data")))
    assert cfg.in_shape == (224, 224, 3)
    assert cfg.aux_shape == (16,)
    assert len(ds) == 1
