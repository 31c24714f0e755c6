"""Deployment CLI: folder/.npz -> bitstream -> features round trip."""

import numpy as np
import pytest


def _make_image_folder(root, n_per_class=3, size=(40, 48)):
    from PIL import Image

    rng = np.random.default_rng(0)
    for cname in ("cats", "dogs"):
        d = root / cname
        d.mkdir(parents=True)
        for i in range(n_per_class):
            arr = rng.integers(0, 256, (*size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")


def test_cli_compress_info_decompress_folder(tmp_path, capsys):
    from lossyless_tpu.hub.cli import main

    _make_image_folder(tmp_path / "imgs")
    out = tmp_path / "ds.bin"
    labels = tmp_path / "labels.npy"

    rc = main(["compress", str(tmp_path / "imgs"), str(out),
               "--labels", str(labels), "--batch-size", "4",
               "--arch", "tiny"])
    assert rc == 0 and out.exists() and labels.exists()
    assert "bits/img" in capsys.readouterr().out

    rc = main(["info", str(out)])
    assert rc == 0
    assert "6 images" in capsys.readouterr().out

    rc = main(["decompress", str(out), str(tmp_path / "z.npz"),
               "--labels", str(labels), "--arch", "tiny"])
    assert rc == 0
    z = np.load(tmp_path / "z.npz")
    assert z["z"].shape == (6, 512)
    # class subfolders in sorted order: cats=0, dogs=1
    np.testing.assert_array_equal(np.sort(z["y"]), [0, 0, 0, 1, 1, 1])


def test_cli_npz_input_roundtrip(tmp_path):
    from lossyless_tpu.hub.cli import main
    from lossyless_tpu.coding.bitstream import read_dataset

    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (5, 64, 64, 3), dtype=np.uint8)
    y = np.arange(5)
    np.savez(tmp_path / "in.npz", x=x, y=y)
    out = tmp_path / "ds.bin"

    rc = main(["compress", str(tmp_path / "in.npz"), str(out),
               "--labels", str(tmp_path / "y.npy"), "--batch-size", "2",
               "--arch", "tiny"])
    assert rc == 0
    assert len(list(read_dataset(out))) == 5
    np.testing.assert_array_equal(
        np.load(tmp_path / "y.npy").astype(np.int64), y)


def test_cli_device_preprocess_matches_host_path(tmp_path):
    """--device-preprocess fuses resize/normalize on device; streams for the
    same uniform-size input agree with the host-PIL path to within the
    pinned resize drift (identical symbols for nearly all dims)."""
    from lossyless_tpu.hub.cli import main
    from lossyless_tpu.coding.bitstream import read_dataset

    rng = np.random.default_rng(2)
    x = rng.integers(0, 256, (4, 96, 96, 3), dtype=np.uint8)
    np.savez(tmp_path / "in.npz", x=x)

    rc = main(["compress", str(tmp_path / "in.npz"), str(tmp_path / "a.bin"),
               "--arch", "tiny", "--batch-size", "4"])
    assert rc == 0
    rc = main(["compress", str(tmp_path / "in.npz"), str(tmp_path / "b.bin"),
               "--arch", "tiny", "--batch-size", "4",
               "--device-preprocess", "96", "96"])
    assert rc == 0
    assert len(list(read_dataset(tmp_path / "a.bin"))) == 4
    assert len(list(read_dataset(tmp_path / "b.bin"))) == 4
    # actually compare the decoded features: the device (jax cubic) and
    # host (PIL bicubic) resizes drift at uint8-rounding scale, so the
    # quantized latents must agree on nearly all dims
    rc = main(["decompress", str(tmp_path / "a.bin"),
               str(tmp_path / "za.npz"), "--arch", "tiny"])
    assert rc == 0
    rc = main(["decompress", str(tmp_path / "b.bin"),
               str(tmp_path / "zb.npz"), "--arch", "tiny"])
    assert rc == 0
    za = np.load(tmp_path / "za.npz")["z"]
    zb = np.load(tmp_path / "zb.npz")["z"]
    assert za.shape == zb.shape == (4, 512)
    frac_same = float((za == zb).mean())
    assert frac_same > 0.9, f"only {frac_same:.2%} of latent dims agree"


def test_cli_mesh_streams_match_single_device(tmp_path):
    """--mesh N from the shell: byte-identical streams to single-device
    (ragged final batch included via the pad-and-trim path)."""
    from lossyless_tpu.hub.cli import main
    from lossyless_tpu.coding.bitstream import read_dataset

    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (10, 64, 64, 3), dtype=np.uint8)
    np.savez(tmp_path / "in.npz", x=x)

    rc = main(["compress", str(tmp_path / "in.npz"), str(tmp_path / "s.bin"),
               "--arch", "tiny", "--batch-size", "6"])
    assert rc == 0
    rc = main(["compress", str(tmp_path / "in.npz"), str(tmp_path / "m.bin"),
               "--arch", "tiny", "--batch-size", "6", "--mesh", "4"])
    assert rc == 0
    single = list(read_dataset(tmp_path / "s.bin"))
    meshed = list(read_dataset(tmp_path / "m.bin"))
    assert len(single) == len(meshed) == 10
    assert single == meshed


def test_cli_eval_linear_probe(tmp_path, capsys):
    """eval: LinearSVC on z/y npz pairs (the reference README's downstream
    evaluation step, as a shell command)."""
    from lossyless_tpu.hub.cli import main

    rng = np.random.default_rng(4)
    centers = rng.normal(size=(3, 16)) * 4
    for name, n in (("tr.npz", 120), ("te.npz", 60)):
        y = rng.integers(0, 3, n)
        z = centers[y] + rng.normal(size=(n, 16))
        np.savez(tmp_path / name, z=z, y=y)

    rc = main(["eval", str(tmp_path / "tr.npz"), str(tmp_path / "te.npz"),
               "--C", "1.0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Accuracy:" in out
    acc = float(out.split("Accuracy: ")[1].split("%")[0])
    assert acc > 90.0  # well-separated gaussian blobs
