"""Deployment CLIP compressor — the reference's hub API, TPU-native.

Equivalent of `/root/reference/hub/compressor.py` (`ClipCompressor`) with the
same public surface — `compress`, `decompress`, `get_rate`,
`compress_dataset`, `decompress_dataset` — and a bit-identical dataset file
format (`lossyless_tpu/coding/bitstream.py`).

TPU redesign of the hot path (reference :73-103,150-207):

* ViT-B/32 forward in bf16 on the MXU (reference: fp16 CUDA), preprocessing
  (resize/normalize) fused into the same jit program.
* quantization symbols computed on device inside the same program; only the
  int32 symbols cross to the host.
* host-side rANS runs on a thread pool *overlapped* with the next batch's
  device compute (double buffering across the host/device boundary) — the
  reference encodes serially after each forward.
* decode is batched (the reference decodes one record at a time, :209-254).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..coding import entropy_bottleneck as eb
from ..coding.bitstream import read_dataset, write_dataset
from ..coding.rans import RansCodec
from ..nn.vit import (VisionTransformer, clip_preprocess,
                      convert_openai_clip_weights, vit_b32)


class ClipCompressor:
    """CLIP ViT-B/32 + per-dim affine + factorized entropy bottleneck.

    Parameters
    ----------
    eb_params : dict
        Entropy-bottleneck parameter pytree (e.g. from
        `hub.load_reference.load_factorized_rate`).
    scaling, biasing : (512,) arrays
        The per-dim affine (reference hub/compressor.py:46-47,105-115).
    clip_params : flax params dict, optional
        Converted CLIP visual weights; random init if None (throughput work
        and format round-trips don't depend on weight values).
    """

    def __init__(self, eb_params, scaling, biasing, clip_params=None,
                 dtype=jnp.bfloat16, seed: int = 0, mesh=None, model=None,
                 raw_input_hw: tuple | None = None,
                 table_arithmetic: str = "compressai"):
        """`mesh`: optional `jax.sharding.Mesh` with a "data" axis — batches
        are sharded over it so `compress_dataset` scales across chips
        (dataset-axis scaling, SURVEY.md §5.7); weights are replicated.
        Streams are identical to the single-chip output for any mesh size.
        `model`: override the encoder tower (any module mapping normalized
        224px NHWC images to 512-d embeddings; default CLIP ViT-B/32).
        `raw_input_hw`: when set to the source (H, W), `compress`/
        `compress_dataset`/`__call__` accept RAW uint8 NHWC batches at that
        resolution; bicubic resize to 224 + CLIP normalization run ON DEVICE,
        fused into the encode program — one dispatch per batch, and only
        H*W*3 uint8 bytes/img cross the host->device boundary (the reference
        preprocesses on CPU dataloader workers via PIL, hub/compressor.py:39).
        `table_arithmetic`: float pipeline for the CDF-table build.
        "compressai" (default) reproduces CompressAI's torch-fp32 update()
        bit-for-bit so streams cross-decode with the reference hub
        (requires torch, host-side setup only); "float64" is the torch-free
        numpy build — self-consistent, but 7-14 of 512 channels' tables
        differ from CompressAI's on the published checkpoints
        (tests/test_eb_torch_fuzz.py), so do not mix the two across a
        sender/receiver pair.
        """
        self.z_dim = 512
        self.mesh = mesh
        self.raw_input_hw = tuple(raw_input_hw) if raw_input_hw else None
        self.model = model if model is not None else vit_b32(dtype=dtype)
        self._dtype = dtype
        self._seed = seed
        # store tower weights in the compute dtype: fp32 storage would make
        # every forward re-read 2x the bytes just to downcast (LayerNorm
        # params are upcast back inside the fp32 LN islands). Random init is
        # LAZY (first encode use): decompress-only usage never pays the
        # 88M-param tower construction.
        self.clip_params = None
        if clip_params is not None:
            self.clip_params = jax.tree.map(lambda p: jnp.asarray(p, dtype),
                                            clip_params)
        self.eb_params = {k: jnp.asarray(v) for k, v in eb_params.items()}
        self.scaling = jnp.asarray(scaling, jnp.float32)
        self.biasing = jnp.asarray(biasing, jnp.float32)

        eb_np = {k: np.asarray(v) for k, v in eb_params.items()}
        self.table_arithmetic = table_arithmetic
        tables = eb.build_cdf_tables(eb_np, arithmetic=table_arithmetic)
        self.codec = RansCodec(tables.quantized_cdf, tables.cdf_length,
                               tables.offset)
        self.medians_np = np.asarray(eb.medians(eb_np))
        self.indexes = np.arange(self.z_dim, dtype=np.int32)
        # host-side copies of the output affine: decode is pure host work
        # (rANS + two vector ops), so it must not pay a device dispatch per
        # batch — the reference's decode explicitly runs without a GPU
        # (README.md:64-66), and on a tunneled TPU each dispatch costs more
        # than the decode itself
        self._out_scale_np = np.exp(np.asarray(scaling, np.float32))
        self._biasing_np = np.asarray(biasing, np.float32)

        if mesh is not None:
            from jax import shard_map
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._data_sharding = NamedSharding(mesh, P("data"))
            repl = self._repl = NamedSharding(mesh, P())
            if self.clip_params is not None:
                self.clip_params = jax.device_put(self.clip_params, repl)
            self.eb_params = jax.device_put(self.eb_params, repl)
            self.scaling = jax.device_put(self.scaling, repl)
            self.biasing = jax.device_put(self.biasing, repl)
            # shard_map gives the (Pallas) kernels their true per-shard
            # shapes; each chip encodes its batch shard independently.
            # check_vma=False: the body is pure per-shard data parallelism
            # (no cross-shard collectives), and the vma checker otherwise
            # rejects pallas_call outputs inside shard_map ("vma on
            # ShapeDtypeStruct must not be None") when the tower uses the
            # fused attention kernel on a TPU backend
            self._encode_fn = jax.jit(shard_map(
                self._encode_symbols, mesh=mesh, in_specs=P("data"),
                out_specs=P("data"), check_vma=False))
            self._features_fn = jax.jit(shard_map(
                self._features, mesh=mesh, in_specs=P("data"),
                out_specs=P("data"), check_vma=False))
        else:
            self._data_sharding = None
            self._encode_fn = jax.jit(self._encode_symbols)
            self._features_fn = jax.jit(self._features)

    # -- device programs ----------------------------------------------------

    def _ensure_tower(self):
        """Materialize the tower weights before the first encode trace.

        The jitted encode/features programs capture `clip_params` at trace
        time, so this must run before their first call; decode paths never
        touch the tower and skip the cost entirely.
        """
        if self.clip_params is None:
            dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
            p = self.model.init(jax.random.key(self._seed), dummy)["params"]
            self.clip_params = jax.tree.map(
                lambda q: jnp.asarray(q, self._dtype), p)
            if self.mesh is not None:
                self.clip_params = jax.device_put(self.clip_params,
                                                  self._repl)

    def _maybe_preprocess(self, x):
        """Fused device preprocess for raw uint8 inputs (raw_input_hw).

        Same computation as the public `preprocess_batch`, traced into the
        encode program rather than run as a separate dispatch.
        """
        return x if self.raw_input_hw is None else self.preprocess_batch(x)

    def _embed(self, x):
        """Normalized [0,1] NHWC 224px images -> 512-d CLIP embedding."""
        return self.model.apply({"params": self.clip_params}, x)

    def _process_z_in(self, z):
        return (z.astype(jnp.float32) + self.biasing) * jnp.exp(self.scaling)

    def _process_z_out(self, z_hat):
        return z_hat / jnp.exp(self.scaling) - self.biasing

    def _encode_symbols(self, x):
        z = self._embed(self._maybe_preprocess(x))
        z_in = self._process_z_in(z)
        med = eb.medians(self.eb_params)[None, :]
        return jnp.round(z_in - med).astype(jnp.int32)

    def _features(self, x):
        z = self._embed(self._maybe_preprocess(x))
        z_in = self._process_z_in(z)
        z_hat = eb.quantize(self.eb_params, z_in, "dequantize")
        return self._process_z_out(z_hat)

    def _pad_for_mesh(self, x: jnp.ndarray) -> tuple[jnp.ndarray, int]:
        """Pad a ragged batch up to a multiple of the mesh size.

        shard_map needs the batch evenly divisible across chips; dataset
        tails aren't. Output is per-image, so padded rows are simply dropped
        after the device program — streams stay identical to single-chip.
        """
        if self.mesh is None:
            return x, 0
        pad = (-x.shape[0]) % self.mesh.devices.size
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        return x, pad

    # -- public API (parity with hub/compressor.py) -------------------------

    def __call__(self, x, is_compress: bool = False):
        if is_compress:
            return self.compress(x)
        self._ensure_tower()
        xp, pad = self._pad_for_mesh(jnp.asarray(x))
        out = np.asarray(self._features_fn(xp))
        return out[:len(out) - pad] if pad else out

    def compress(self, x) -> list[bytes]:
        """Batch of normalized images -> per-image byte strings."""
        self._ensure_tower()
        xp, pad = self._pad_for_mesh(jnp.asarray(x))
        symbols = np.asarray(self._encode_fn(xp))
        if pad:
            symbols = symbols[:len(symbols) - pad]
        return self.codec.encode_batch(symbols, self.indexes)

    def decompress(self, byte_strings: list[bytes]) -> np.ndarray:
        symbols = self.codec.decode_batch(byte_strings, self.indexes)
        z_hat = symbols.astype(np.float32) + self.medians_np[None]
        # host-only inverse affine (see __init__): same fp32 arithmetic as
        # the traced _process_z_out, no device round-trip per batch
        return z_hat / self._out_scale_np[None] - self._biasing_np[None]

    def get_rate(self, x) -> float:
        """Mean coded bits per image over a batch (hub/compressor.py:127-135)."""
        streams = self.compress(x)
        return 8.0 * sum(len(s) for s in streams) / len(streams)

    def compress_dataset(self, batches: Iterable, file, label_file=None,
                         is_info: bool = True, n_total: int | None = None):
        """Compress an iterable of (x, y) batches into a dataset bitstream.

        `batches` yields NHWC float images already preprocessed to 224px
        normalized (use `preprocess_batch` otherwise). Two-deep pipeline:
        batch i+1 is dispatched to the device before batch i is read back,
        so device compute, host readback, and host rANS all overlap (a
        depth-1 pipeline leaves a dispatch bubble — measured ~10% of
        throughput on the bench hot path).
        """
        self._ensure_tower()
        start = time.time()
        all_streams: list[bytes] = []
        labels = []
        pool = ThreadPoolExecutor(max_workers=1)
        pending = None        # host-coding future for the previous batch
        inflight = None       # device symbols not yet read back

        def _drain(entry):
            nonlocal pending
            dev_syms, pad = entry
            symbols = np.asarray(dev_syms)          # blocks on THIS batch
            if pad:
                symbols = symbols[:len(symbols) - pad]
            if pending is not None:
                all_streams.extend(pending.result())
            pending = pool.submit(self.codec.encode_batch, symbols,
                                  self.indexes)

        for item in batches:
            x, y = item if isinstance(item, (tuple, list)) else (item, None)
            xp, pad = self._pad_for_mesh(jnp.asarray(x))
            dev = self._encode_fn(xp)               # async dispatch
            if label_file is not None and y is not None:
                # natural dtype: a uint16 cast would silently wrap ids
                # >65535 / negatives and truncate float regression targets
                labels.append(np.asarray(y))
            if inflight is not None:
                _drain(inflight)
            inflight = (dev, pad)
        if inflight is not None:
            _drain(inflight)
        if pending is not None:
            all_streams.extend(pending.result())
        pool.shutdown()

        write_dataset(file, all_streams, len(all_streams))
        enc_time = (time.time() - start) / max(1, len(all_streams))
        rate = 8 * Path(file).stat().st_size / max(1, len(all_streams))

        if label_file is not None and labels:
            np.save(label_file, np.concatenate(labels), allow_pickle=False)
        if is_info:
            print(f"Rate: {rate:.2f} bits/img | Encoding: {1/enc_time:.2f} img/sec ")
        return rate, 1.0 / enc_time

    def decompress_dataset(self, file, label_file=None, is_info: bool = True,
                           batch_size: int = 1024):
        """Decode a dataset bitstream back to (N, 512) features (batched).

        Streams are consumed lazily from `read_dataset` in `batch_size`
        chunks — decode memory stays bounded by one batch of byte strings,
        never the whole file (100k+-image datasets don't materialize twice).
        """
        start = time.time()
        out = []
        batch: list[bytes] = []
        for s in read_dataset(file):
            batch.append(s)
            if len(batch) == batch_size:
                out.append(self.decompress(batch))
                batch = []
        if batch:
            out.append(self.decompress(batch))
        z_hat = np.concatenate(out) if out else np.empty((0, self.z_dim))
        dec_time = (time.time() - start) / max(1, len(z_hat))
        if is_info:
            print(f"Decoding: {1/dec_time:.2f} img/sec ")
        if label_file is not None:
            y = np.load(label_file, allow_pickle=False)
            if np.issubdtype(y.dtype, np.integer):
                y = y.astype(np.int64)  # class labels; floats stay as-is
            return z_hat, y
        return z_hat

    @staticmethod
    def preprocess_batch(x_uint8_nhwc) -> jnp.ndarray:
        """[0,255] uint8 NHWC of any size -> normalized 224px float batch."""
        x = jnp.asarray(x_uint8_nhwc, jnp.float32) / 255.0
        return clip_preprocess(x)


def load_pretrained(beta: str = "b005", clip_state_dict=None,
                    dtype=jnp.bfloat16, **kwargs) -> ClipCompressor:
    """Build a ClipCompressor from the reference's published rate weights.

    Mirrors the hub entry points `clip_compressor_b{001,005,01}`
    (reference hubconf.py:22-52). CLIP weights are converted when provided
    (zero-egress environments fall back to random init). Extra kwargs
    (`mesh=`, `raw_input_hw=`, ...) pass through to `ClipCompressor`.
    """
    from .load_reference import load_factorized_rate

    eb_params, scaling, biasing = load_factorized_rate(beta)
    clip_params = None
    if clip_state_dict is not None:
        clip_params = convert_openai_clip_weights(clip_state_dict)
    return ClipCompressor(eb_params, scaling, biasing, clip_params, dtype,
                          **kwargs)
