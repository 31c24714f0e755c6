"""Deployment CLI: compress image datasets into bitstreams from the shell.

The reference exposes the hub compressor only through Python
(`torch.hub.load` + notebook code, reference README.md:10-83). This CLI
makes the deployment path a shell command:

    # folder of images (class subfolders -> labels) or a flat folder
    python -m lossyless_tpu.hub.cli compress data/stl10_test out.bin \
        --beta b005 --labels out_labels.npy

    # .npz with arrays x (N,H,W,3 uint8) [+ y]
    python -m lossyless_tpu.hub.cli compress images.npz out.bin

    # decode back to (N, 512) CLIP-space features
    python -m lossyless_tpu.hub.cli decompress out.bin features.npz \
        --labels out_labels.npy

    # stream stats without touching any accelerator
    python -m lossyless_tpu.hub.cli info out.bin

Images of heterogeneous sizes go through the host-side reference transform
(`nn.vit.pil_clip_preprocess`); uniform-size uint8 batches can instead fuse
resize+normalize into the device program with `--device-preprocess`.
`--clip-weights` loads a real OpenAI CLIP checkpoint (torch .pt) through
`convert_openai_clip_weights`; without it the tower is randomly initialized
(format/throughput work only — features are not meaningful CLIP embeddings).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

IMAGE_SUFFIXES = (".jpg", ".jpeg", ".png", ".webp", ".bmp")


def _iter_folder(root: Path):
    """Yield (path, label|None) pairs; class subfolders define labels."""
    classes = sorted(d.name for d in root.iterdir() if d.is_dir())
    if classes:
        for label, cname in enumerate(classes):
            for p in sorted((root / cname).rglob("*")):
                if p.suffix.lower() in IMAGE_SUFFIXES:
                    yield p, label
    else:
        for p in sorted(root.iterdir()):
            if p.suffix.lower() in IMAGE_SUFFIXES:
                yield p, None


def _folder_batches(root: Path, batch_size: int, preprocess):
    """Prefetched folder batches: `preprocess` (the thread-pool PIL decode,
    `nn.vit.pil_clip_preprocess` / raw stack) runs one batch ahead on a
    background thread so the compress loop's device dispatch never waits on
    JPEG decode — the reference's num_workers=16 DataLoader equivalent
    (hub/compressor.py:186-189). Batches are byte-identical to the inline
    loop (data.loader contract)."""
    from ..data.loader import prefetch

    def gen():
        from PIL import Image

        imgs, labels = [], []
        for path, label in _iter_folder(root):
            imgs.append(Image.open(path))  # lazy: decode happens in the pool
            labels.append(label)
            if len(imgs) == batch_size:
                yield preprocess(imgs), _labels_or_none(labels)
                imgs, labels = [], []
        if imgs:
            yield preprocess(imgs), _labels_or_none(labels)

    return prefetch(gen())


def _labels_or_none(labels):
    return None if any(l is None for l in labels) else np.asarray(labels)


def _npz_batches(path: Path, batch_size: int, preprocess):
    data = np.load(path, allow_pickle=False)
    if "x" not in data:
        raise SystemExit(f"{path}: .npz input needs an 'x' array "
                         f"(found {sorted(data.files)})")
    x, y = data["x"], data.get("y")
    for i in range(0, len(x), batch_size):
        xb = x[i:i + batch_size]
        yield preprocess(xb), (y[i:i + batch_size] if y is not None else None)


def _build_compressor(args):
    import jax.numpy as jnp

    from .compressor import load_pretrained

    clip_sd = None
    if args.clip_weights:
        import torch

        clip_sd = torch.load(args.clip_weights, map_location="cpu",
                             weights_only=False)
        if isinstance(clip_sd, dict) and "state_dict" in clip_sd:
            clip_sd = clip_sd["state_dict"]
    kwargs = {}
    if args.arch == "tiny":
        # smoke-test tower (512-d output so the published rate weights fit)
        from ..nn.vit import VisionTransformer

        kwargs["model"] = VisionTransformer(width=64, layers=2, heads=2,
                                            out_dim=512,
                                            dtype=jnp.dtype(args.dtype))
    if getattr(args, "device_preprocess", None):
        kwargs["raw_input_hw"] = tuple(args.device_preprocess)
    if getattr(args, "mesh", 0):
        from ..core.mesh import make_mesh

        kwargs["mesh"] = make_mesh(args.mesh)
    if getattr(args, "table_arithmetic", None):
        kwargs["table_arithmetic"] = args.table_arithmetic
    return load_pretrained(args.beta, clip_state_dict=clip_sd,
                           dtype=jnp.dtype(args.dtype), **kwargs)


def cmd_compress(args) -> int:
    if getattr(args, "jpeg_draft", False):
        # flag form of the env knob, read by the CLIP-preprocess decode
        # (nn.vit.pil_clip_preprocess / data.loader). The other input paths
        # never decode-and-resize JPEGs, so fail loudly rather than let the
        # flag be a silent no-op there.
        if args.device_preprocess:
            raise SystemExit("--jpeg-draft has no effect with "
                             "--device-preprocess (images are sent at "
                             "native size; resizing happens on device)")
        if Path(args.input).suffix == ".npz":
            raise SystemExit("--jpeg-draft has no effect on .npz input "
                             "(already-decoded arrays)")
        os.environ["LOSSYLESS_JPEG_DRAFT"] = "1"
    comp = _build_compressor(args)
    src = Path(args.input)

    if args.device_preprocess:
        # raw uint8 batches cross the boundary; resize+normalize fuse into
        # the device encode program (uniform source size required)
        def preprocess(imgs):
            return np.stack([np.asarray(im, np.uint8) for im in imgs]) \
                if isinstance(imgs, list) else np.asarray(imgs, np.uint8)
    else:
        from ..nn.vit import pil_clip_preprocess

        def preprocess(imgs):
            return pil_clip_preprocess(imgs)

    if src.is_dir():
        batches = _folder_batches(src, args.batch_size, preprocess)
    elif src.suffix == ".npz":
        batches = _npz_batches(src, args.batch_size, preprocess)
    else:
        raise SystemExit(f"{src}: expected an image folder or a .npz")

    rate, img_per_sec = comp.compress_dataset(
        batches, args.output, label_file=args.labels, is_info=False)
    print(f"Rate: {rate:.2f} bits/img | Encoding: {img_per_sec:.2f} img/sec")
    return 0


def cmd_decompress(args) -> int:
    comp = _build_compressor(args)
    out = comp.decompress_dataset(args.input, label_file=args.labels,
                                  is_info=False, batch_size=args.batch_size)
    z_hat, y = out if isinstance(out, tuple) else (out, None)
    arrays = {"z": z_hat}
    if y is not None:
        arrays["y"] = y
    np.savez(args.output, **arrays)
    print(f"Decoded {len(z_hat)} x {z_hat.shape[-1]}-d features "
          f"-> {args.output}")
    return 0


def cmd_eval(args) -> int:
    """LinearSVC probe on decompressed features (reference README's
    downstream STL10 evaluation: 98.65% acc in 0.5s train)."""
    from ..analysis.linear_eval import z_linear_eval

    def load(path):
        d = np.load(path, allow_pickle=False)
        if "z" not in d or "y" not in d:
            raise SystemExit(f"{path}: need arrays z and y "
                             f"(from `decompress --labels ...`)")
        return d["z"], d["y"]

    z_tr, y_tr = load(args.train)
    z_te, y_te = load(args.test)
    import time

    t0 = time.time()
    out = z_linear_eval(z_tr, y_tr, z_te, y_te, n_iter=args.n_iter,
                        fixed_C=args.C)
    print(f"Accuracy: {100 * out['acc']:.2f}% | "
          f"Training time: {time.time() - t0:.1f} sec | "
          f"C: {out['best_C']:.4g}")
    return 0


def cmd_info(args) -> int:
    from ..coding.bitstream import read_dataset

    n, total = 0, 0
    for s in read_dataset(args.input):
        n += 1
        total += len(s)
    file_bits = 8 * Path(args.input).stat().st_size
    print(f"{args.input}: {n} images, "
          f"{8 * total / max(1, n):.2f} payload bits/img, "
          f"{file_bits / max(1, n):.2f} file bits/img")
    return 0


def _add_model_flags(p):
    p.add_argument("--beta", default="b005",
                   choices=("b001", "b005", "b01"),
                   help="published rate model (b01 compresses most)")
    p.add_argument("--clip-weights", default=None,
                   help="OpenAI CLIP torch checkpoint (.pt) for the tower")
    p.add_argument("--dtype", default="bfloat16",
                   help="tower compute dtype (bfloat16 on TPU)")
    p.add_argument("--arch", default="vit_b32", choices=("vit_b32", "tiny"),
                   help="tiny = 2-layer smoke-test tower")
    p.add_argument("--table-arithmetic", default="compressai",
                   choices=("compressai", "float64"),
                   help="CDF-table float pipeline. The stream format has no "
                        "arithmetic marker (it is byte-matched to the "
                        "reference's), so sender and receiver MUST use the "
                        "same value; 'compressai' cross-decodes with the "
                        "reference hub, 'float64' is the torch-free build "
                        "(and what pre-round-5 streams were minted with)")


def main(argv=None) -> int:
    from ..core.mesh import respect_platform_env

    # honor `JAX_PLATFORMS=cpu python -m lossyless_tpu.hub.cli ...` even
    # when a site hook pre-imported jax with a stale platform default
    respect_platform_env()
    parser = argparse.ArgumentParser(prog="lossyless_tpu.hub.cli",
                                     description=__doc__.split("\n\n")[0])
    sub = parser.add_subparsers(dest="cmd", required=True)

    pc = sub.add_parser("compress", help="images -> dataset bitstream")
    pc.add_argument("input", help="image folder or .npz with x [, y]")
    pc.add_argument("output", help="output bitstream file")
    pc.add_argument("--labels", default=None,
                    help="also write labels to this .npy")
    pc.add_argument("--batch-size", type=int, default=256)
    pc.add_argument("--device-preprocess", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="inputs are uniform raw uint8 HxW; fuse "
                         "resize+normalize into the device program")
    pc.add_argument("--jpeg-draft", action="store_true",
                    help="decode JPEGs larger than the input size at a "
                         "reduced DCT scale (libjpeg scaled decode, 2-3x "
                         "faster; slightly different pixels than "
                         "full-resolution decode — see PERF.md)")
    pc.add_argument("--mesh", type=int, default=0,
                    help="shard encode batches over N chips (0 = single "
                         "device); streams are identical for any mesh size")
    _add_model_flags(pc)
    pc.set_defaults(fn=cmd_compress)

    pd = sub.add_parser("decompress", help="bitstream -> features .npz")
    pd.add_argument("input", help="dataset bitstream file")
    pd.add_argument("output", help="output .npz (z [, y])")
    pd.add_argument("--labels", default=None,
                    help="labels .npy written by compress")
    pd.add_argument("--batch-size", type=int, default=1024)
    _add_model_flags(pd)
    pd.set_defaults(fn=cmd_decompress)

    pe = sub.add_parser("eval", help="LinearSVC probe on decoded features")
    pe.add_argument("train", help=".npz with z, y (decompress --labels)")
    pe.add_argument("test", help=".npz with z, y")
    pe.add_argument("--n-iter", type=int, default=8,
                    help="RandomizedSearchCV iterations over C/class_weight")
    pe.add_argument("--C", type=float, default=None,
                    help="skip the search, use this LinearSVC C")
    pe.set_defaults(fn=cmd_eval)

    pi = sub.add_parser("info", help="stream stats (no accelerator)")
    pi.add_argument("input")
    pi.set_defaults(fn=cmd_info)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
