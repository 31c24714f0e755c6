"""CLIP ViT-B/32 visual tower, TPU-native.

This is the hot path of the reference's deployment compressor
(`/root/reference/hub/compressor.py:39-40,93` — `clip.load("ViT-B/32").visual`
run in fp16 on GPU). Here it is a flax module designed for the MXU:

* bfloat16 activations/weights by default (fp32 LayerNorm statistics),
* patchify expressed as a single strided conv -> (B, 49, 768) so the whole
  network is large batched matmuls,
* pre-LN transformer blocks with QuickGELU (x * sigmoid(1.702x)), matching
  OpenAI CLIP so converted weights are drop-in,
* final LayerNorm on the class token + projection to 512-d embeddings.

`convert_openai_clip_weights` maps an OpenAI CLIP state dict (torch) onto this
module's parameter tree for when real weights are available; tests and
benchmarks run with random init (throughput is weight-agnostic).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _use_pallas_attention() -> bool:
    """Pallas fused attention on real TPU backends; einsum elsewhere."""
    from lossyless_tpu.nn.flash_attn import use_pallas_backend

    return use_pallas_backend()


class MHSA(nn.Module):
    """Multi-head self-attention.

    On TPU the whole attention (per-head logits, softmax, weighted values)
    runs as one Pallas kernel straight off the fused qkv projection in its
    natural (B, N, 3D) layout (`nn/flash_attn.py`): at ViT-B/32's 50-token
    sequences the XLA einsum lowering otherwise forces transposed layouts on
    the surrounding LayerNorms/Dense layers and round-trips fp32 logits
    through HBM — profiled at ~45% of the forward step.
    """

    width: int
    heads: int
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"  # auto | pallas | einsum
    # queries for the class token only: output is (B, 1, D). Exact same
    # arithmetic as the full attention's token-0 row — used in the last
    # block when only x[:, 0] is consumed downstream (VisionTransformer
    # cls_only_last). K/V still cover every token; the q projection is a
    # static column-slice of the same fused qkv kernel, so the parameter
    # tree (and converted CLIP weights) are unchanged.
    cls_only: bool = False

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        h = self.heads
        if self.cls_only:
            w, b = _DenseParams(D, 3 * D, name="qkv")()
            w = w.astype(self.dtype)
            b = b.astype(self.dtype)
            q0 = x[:, :1] @ w[:, :D] + b[:D]
            kv = x @ w[:, D:] + b[D:]
            impl = self.attn_impl
            if impl == "auto":
                impl = "pallas" if _use_pallas_attention() else "einsum"
            if impl == "pallas":
                from lossyless_tpu.nn.flash_attn import fused_attention_cls

                out = fused_attention_cls(q0, kv, h)
            else:
                from lossyless_tpu.nn.flash_attn import \
                    _reference_attention_cls

                out = _reference_attention_cls(q0, kv, h)
            return nn.Dense(D, dtype=self.dtype, name="proj")(out)
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(x)
        impl = self.attn_impl
        if impl == "auto":
            impl = "pallas" if _use_pallas_attention() else "einsum"
        if impl == "pallas":
            from lossyless_tpu.nn.flash_attn import fused_attention

            out = fused_attention(qkv, h)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, N, h, D // h)
            k = k.reshape(B, N, h, D // h)
            v = v.reshape(B, N, h, D // h)
            scale = (D // h) ** -0.5
            attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)


class PatchEmbed(nn.Module):
    """Patchify as block-reshape + one big matmul.

    A stride=patch conv is exactly this computation; written as a matmul it
    lands directly on the MXU with no im2col lowering. The parameter keeps
    the conv HWIO layout and the `{"kernel": ...}` tree, so converted CLIP
    weights (convert_openai_clip_weights) and older checkpoints are drop-in.
    """

    width: int
    patch: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        p = self.patch
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, C, self.width))
        gh, gw = H // p, W // p
        # (B, gh, p, gw, p, C) -> (B, gh*gw, p*p*C); the (p, p, C) flatten
        # order matches the HWIO kernel flatten below
        x = x.reshape(B, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh * gw, p * p * C)
        w = kernel.astype(self.dtype).reshape(p * p * C, self.width)
        return x @ w


class _LNParams(nn.Module):
    """Param holder with nn.LayerNorm's tree ({scale, bias})."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class _DenseParams(nn.Module):
    """Param holder with nn.Dense's tree ({kernel, bias})."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (self.features_in, self.features_out)),
                self.param("bias", nn.initializers.zeros,
                           (self.features_out,)))


class Block(nn.Module):
    """Pre-LN transformer block.

    LayerNorm statistics in fp32 (body bf16); eps=1e-5 matches torch's
    LayerNorm, which the published CLIP weights were trained with (flax
    defaults to 1e-6). The reference runs the tower under fp16 autocast but
    OpenAI CLIP's LayerNorm subclass still computes in fp32, so fp32 is the
    parity default; `ln_dtype=bfloat16` is an opt-in inference knob (see
    VisionTransformer). Keeping the LNs as plain flax ops measured FASTER
    than a Pallas add+LN kernel: XLA fuses them cleanly once the attention
    einsums (whose layout preferences caused the transposed-LN problem) are
    replaced by the Pallas attention kernel.

    `mlp_impl="pallas"` additionally runs the whole MLP half-block
    (LN2 -> fc -> QuickGELU -> proj -> residual) as one VMEM kernel
    (`nn/flash_attn.py::fused_mlp_block`); the param tree is unchanged.
    Measured ~4% slower than XLA's scheduling at ViT-B/32 batch 512 (XLA
    already pipelines these matmuls well once the attention kernel removes
    the layout pressure), so it stays opt-in — its value is the O(1)
    activation footprint for remat-style training at large batch.
    """

    width: int
    heads: int
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    mlp_impl: str = "xla"  # xla | pallas
    ln_dtype: Any = jnp.float32
    # compute only the class token's output (B, 1, width): exact same math
    # as the full block's token-0 row. Only valid as the LAST block when
    # downstream reads x[:, 0] alone (VisionTransformer cls_only_last).
    cls_only: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.ln_dtype, epsilon=1e-5,
                         name="ln_1")(x).astype(self.dtype)
        if self.cls_only:
            # residual stream narrows to the class token; the MLP half-block
            # then runs on one token (plain XLA path: a (B, 1, D) problem is
            # too small for the fused-MLP kernel to matter)
            x = x[:, :1] + MHSA(self.width, self.heads, self.dtype,
                                self.attn_impl, cls_only=True,
                                name="attn")(y)
            y = nn.LayerNorm(dtype=self.ln_dtype, epsilon=1e-5,
                             name="ln_2")(x).astype(self.dtype)
            y = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_fc")(y)
            y = y * nn.sigmoid(1.702 * y)
            y = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(y)
            return x + y
        x = x + MHSA(self.width, self.heads, self.dtype, self.attn_impl,
                     name="attn")(y)
        if self.mlp_impl == "pallas":
            from lossyless_tpu.nn.flash_attn import fused_mlp_block

            lns, lnb = _LNParams(self.width, name="ln_2")()
            fcw, fcb = _DenseParams(self.width, 4 * self.width,
                                    name="mlp_fc")()
            prw, prb = _DenseParams(4 * self.width, self.width,
                                    name="mlp_proj")()
            return fused_mlp_block(x, lns, lnb, fcw, fcb, prw, prb)
        y = nn.LayerNorm(dtype=self.ln_dtype, epsilon=1e-5,
                         name="ln_2")(x).astype(self.dtype)
        y = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_fc")(y)
        y = y * nn.sigmoid(1.702 * y)  # QuickGELU
        y = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(y)
        return x + y


class VisionTransformer(nn.Module):
    """CLIP visual tower. Input NHWC float images (already normalized)."""

    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    out_dim: int = 512
    image_size: int = 224
    dtype: Any = jnp.bfloat16
    # rematerialize block activations in backward (jax.checkpoint): trades
    # ~33% more forward FLOPs for O(layers) less activation memory — for
    # fine-tuning the tower at large batch on memory-constrained chips
    remat: bool = False
    attn_impl: str = "auto"  # auto (pallas on TPU) | pallas | einsum
    mlp_impl: str = "xla"    # xla | pallas (fused MLP half-block)
    # LayerNorm compute dtype. fp32 matches OpenAI CLIP exactly (its LN
    # subclass upcasts even under fp16 autocast). bfloat16 is an opt-in
    # knob; measured throughput-neutral at batch 512 on v5e (XLA already
    # fuses the up/downcasts into the LN passes), so fp32 costs nothing.
    # Params stay fp32 either way; checkpoints/converters are unchanged.
    ln_dtype: Any = jnp.float32
    # Encode-path shortcut: the final block computes only the class token's
    # row (queries/MLP for token 0 alone; K/V still over all tokens) since
    # ln_post reads x[:, 0] exclusively. Mathematically identical — the
    # skipped rows feed nothing — but the cls-only path uses a different
    # lowering (sliced qkv matmul, 1-row einsum/Pallas dot), so outputs are
    # float-tolerance equivalent (~1e-5), not bit-equal; re-encoding the
    # same images across the default flip is not guaranteed byte-identical
    # (decode of existing streams is unaffected — z is stored directly).
    # Worth ~7% of the tower's FLOPs. Parameter tree and
    # converted weights are unchanged. On by default since the device A/B
    # (bin/device_step_bench.py b512 vs cls_last: 35.4 -> 33.5 ms/512 mean,
    # 32.1 -> 27.6 ms min on v5e) confirmed the win; set False only to
    # inspect parity-shaped intermediate activations of the last block.
    cls_only_last: bool = True

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        B = x.shape[0]
        x = x.astype(self.dtype)
        x = PatchEmbed(self.width, self.patch_size, self.dtype,
                       name="patch_embed")(x)
        n_patches = x.shape[1]

        cls = self.param("class_embedding",
                         nn.initializers.normal(0.02), (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, self.width)), x],
            axis=1)
        n_tokens = (self.image_size // self.patch_size) ** 2 + 1
        if n_patches + 1 != n_tokens:
            raise ValueError(
                f"input gives {n_patches} patches but image_size="
                f"{self.image_size} expects {n_tokens - 1}; construct the "
                f"tower with image_size matching the data resolution")
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02), (n_tokens, self.width))
        x = x + pos.astype(self.dtype)[None]

        x = nn.LayerNorm(dtype=self.ln_dtype, epsilon=1e-5,
                         name="ln_pre")(x).astype(self.dtype)
        block_cls = nn.remat(Block) if self.remat else Block
        for i in range(self.layers):
            cls_only = self.cls_only_last and i == self.layers - 1
            x = block_cls(self.width, self.heads, self.dtype, self.attn_impl,
                          self.mlp_impl, self.ln_dtype, cls_only,
                          name=f"block{i}")(x)

        x = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5,
                         name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.out_dim))
        return (x.astype(self.dtype) @ proj.astype(self.dtype)).astype(jnp.float32)


def vit_b32(dtype=jnp.bfloat16) -> VisionTransformer:
    return VisionTransformer(dtype=dtype)


# CLIP preprocessing constants (the reference uses clip.load's preprocess:
# bicubic resize 224 + center crop + per-channel normalize,
# utils/data/images.py:383-389)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(x: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """Resize (bicubic) + center-crop + normalize; NHWC in [0,1]."""
    import jax

    b, h, w, c = x.shape
    scale = size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    x = jax.image.resize(x, (b, nh, nw, c), "cubic")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, size, size, c))
    return (x - CLIP_MEAN) / CLIP_STD


def pil_clip_preprocess(images, size: int = 224) -> np.ndarray:
    """Host-side CLIP preprocess, the reference transform verbatim.

    PIL bicubic resize of the short side to `size`, center crop, /255,
    CLIP-normalize — exactly `clip.load`'s `_transform` (reference
    `utils/data/images.py:383-389`, `hub/compressor.py:39`). Accepts an
    iterable of HWC uint8 arrays or PIL Images (mixed sizes fine); returns
    a (B, size, size, 3) float32 batch. The device-side `clip_preprocess`
    matches this to uint8-rounding tolerance (tests/test_clip_torch_parity);
    use this path when inputs have heterogeneous sizes.
    """
    from PIL import Image

    from ..data.loader import jpeg_draft_enabled

    draft = jpeg_draft_enabled()

    def _one(im):
        pil = im if isinstance(im, Image.Image) else Image.fromarray(im)
        if draft and pil.format == "JPEG":
            # opt-in libjpeg scaled decode (must be requested before pixel
            # access; no-op on already-loaded images): PIL picks the largest
            # DCT reduction keeping both dims >= `size`, so the short side
            # still reaches `size` for the bicubic pass below
            pil.draft("RGB", (size, size))
        if pil.mode != "RGB":
            pil = pil.convert("RGB")
        w, h = pil.size
        scale = size / min(w, h)
        nw, nh = round(w * scale), round(h * scale)
        pil = pil.resize((nw, nh), Image.BICUBIC)
        left, top = (nw - size) // 2, (nh - size) // 2
        pil = pil.crop((left, top, left + size, top + size))
        arr = np.asarray(pil).astype(np.float32) / 255.0
        return (arr - CLIP_MEAN) / CLIP_STD

    # thread-pool per-image map (PIL releases the GIL in decode/resize);
    # ordered, so the batch is byte-identical to the serial loop — the
    # reference parallelizes this transform across DataLoader workers
    from ..data.loader import decode_map

    images = images if isinstance(images, (list, tuple)) else list(images)
    return np.stack(decode_map(_one, images)).astype(np.float32)


def convert_openai_clip_weights(torch_state_dict) -> dict:
    """Map OpenAI CLIP `visual.*` weights onto this module's param tree.

    Accepts the state dict of the full CLIP model or of the visual tower.
    Returns a flax params dict for `VisionTransformer`.
    """
    # A FULL CLIP state dict carries both towers; after stripping "visual."
    # the text tower's transformer.resblocks.* would collide with (and
    # overwrite) the visual ones, so when any visual.* key exists keep ONLY
    # the visual subtree.
    items = torch_state_dict.items()
    if any(k.startswith("visual.") for k in torch_state_dict):
        items = [(k[len("visual."):], v) for k, v in items
                 if k.startswith("visual.")]
    sd = {}
    for k, v in items:
        sd[k] = np.asarray(v.float().cpu().numpy() if hasattr(v, "cpu") else v,
                           dtype=np.float32)

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params = {
        "patch_embed": {
            # torch conv OIHW -> flax HWIO
            "kernel": sd["conv1.weight"].transpose(2, 3, 1, 0)
        },
        "class_embedding": sd["class_embedding"],
        "positional_embedding": sd["positional_embedding"],
        "ln_pre": ln("ln_pre"),
        "ln_post": ln("ln_post"),
        "proj": sd["proj"],
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        p = f"transformer.resblocks.{i}"
        params[f"block{i}"] = {
            "ln_1": ln(f"{p}.ln_1"),
            "ln_2": ln(f"{p}.ln_2"),
            "attn": {
                "qkv": {
                    "kernel": sd[f"{p}.attn.in_proj_weight"].T,
                    "bias": sd[f"{p}.attn.in_proj_bias"],
                },
                "proj": {
                    "kernel": sd[f"{p}.attn.out_proj.weight"].T,
                    "bias": sd[f"{p}.attn.out_proj.bias"],
                },
            },
            "mlp_fc": {
                "kernel": sd[f"{p}.mlp.c_fc.weight"].T,
                "bias": sd[f"{p}.mlp.c_fc.bias"],
            },
            "mlp_proj": {
                "kernel": sd[f"{p}.mlp.c_proj.weight"].T,
                "bias": sd[f"{p}.mlp.c_proj.bias"],
            },
        }
        i += 1
    return params
