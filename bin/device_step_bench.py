"""Device-step microbenchmark for the encode hot path (PERF.md evidence).

Times the pure device program (preprocess + ViT-B/32 + EB symbols, no host
rANS) for a grid of variants, printing ms/batch and img/s. Used to document
the MFU floor and to evaluate kernel experiments (attention impl, fused MLP,
batch size) against the ~23 ms pure-matmul bound at batch 512
(197 TFLOP/s bf16 on v5e).

Usage: python bin/device_step_bench.py [--variants v1,v2,...]
Variants: b512 (default config: cls-only-last ON, matching
VisionTransformer's default), b1024, b256, einsum (XLA attention),
mlp_pallas (fused MLP half-block), ln_bf16, full_last (class-token-only
final block OFF, the pre-round-3 default), attn_g8/attn_g32 (attention
kernel block-size sweep), attn_p4/p8/p16[_g32] (images packed per MXU
dot — measured full-tower LOSSES, PERF.md round 4), attn_hb (head-batched
dots — also a measured loss), attn_bf16sm (bf16 softmax inside the fused
kernel, non-parity dtype).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from lossyless_tpu.core.timing import pipelined_iqm


def run_variant(name: str, batch: int, attn_impl: str = "auto",
                mlp_impl: str = "xla", ln_dtype: str = "float32",
                cls_only_last: bool = True, attn_block: int | None = None,
                attn_pack: int | None = None, head_batch: bool = False,
                softmax_dtype: str | None = None,
                reps: int = 12) -> dict:
    # cls_only_last defaults True to match VisionTransformer's framework
    # default, so 'b512' benchmarks the actual default config; use the
    # 'full_last' variant for the pre-flip A/B.
    from lossyless_tpu.nn import flash_attn

    saved_block = flash_attn.BLOCK_LIMIT
    saved_pack = flash_attn.IMAGE_PACK
    saved_hb = flash_attn.HEAD_BATCH
    saved_sm = flash_attn.SOFTMAX_DTYPE
    try:
        if attn_block is not None:
            flash_attn.BLOCK_LIMIT = attn_block
        if attn_pack is not None:
            flash_attn.IMAGE_PACK = attn_pack
        flash_attn.HEAD_BATCH = head_batch
        if softmax_dtype is not None:
            flash_attn.SOFTMAX_DTYPE = jnp.dtype(softmax_dtype)
        return _run_variant_body(name, batch, attn_impl, mlp_impl, ln_dtype,
                                 cls_only_last, reps)
    finally:
        # restore even when a variant raises mid-run (e.g. a Mosaic
        # verification error): a leaked override would corrupt every later
        # variant's measurement in the same process
        flash_attn.BLOCK_LIMIT = saved_block
        flash_attn.IMAGE_PACK = saved_pack
        flash_attn.HEAD_BATCH = saved_hb
        flash_attn.SOFTMAX_DTYPE = saved_sm


def _run_variant_body(name, batch, attn_impl, mlp_impl, ln_dtype,
                      cls_only_last, reps) -> dict:
    from lossyless_tpu.coding import entropy_bottleneck as eb
    from lossyless_tpu.hub.load_reference import load_factorized_rate
    from lossyless_tpu.nn.vit import CLIP_MEAN, CLIP_STD, VisionTransformer

    eb_params_np, scaling_np, biasing_np = load_factorized_rate("b005")
    eb_params = {k: jnp.asarray(v) for k, v in eb_params_np.items()}
    scaling = jnp.asarray(scaling_np)
    biasing = jnp.asarray(biasing_np)

    model = VisionTransformer(attn_impl=attn_impl, mlp_impl=mlp_impl,
                              ln_dtype=jnp.dtype(ln_dtype),
                              cls_only_last=cls_only_last)
    params = model.init(jax.random.key(0),
                        jnp.zeros((8, 224, 224, 3)))["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    norm_a = jnp.asarray(1.0 / (255.0 * CLIP_STD), jnp.bfloat16)
    norm_b = jnp.asarray(-CLIP_MEAN / CLIP_STD, jnp.bfloat16)

    @jax.jit
    def step(params, bits, salt):
        xb = bits ^ salt
        x = xb.astype(jnp.bfloat16) * norm_a + norm_b
        z = model.apply({"params": params}, x)
        z_in = (z.astype(jnp.float32) + biasing) * jnp.exp(scaling)
        med = eb.medians(eb_params)[None, :]
        return jnp.round(z_in - med).astype(jnp.int8)

    bits = jax.random.bits(jax.random.key(0), (batch, 224, 224, 3),
                           jnp.uint8)
    jax.block_until_ready(step(params, bits, jnp.uint8(255)))

    # depth-2 pipeline + inter-completion gaps: a bare block_until_ready per
    # dispatch would add one tunnel round trip to every sample
    best, min_s = pipelined_iqm(
        lambda r: step(params, bits, jnp.uint8(r)), reps)
    return {"variant": name, "batch": batch,
            "ms_per_batch": round(best * 1e3, 2),
            "img_per_sec_device": round(batch / best, 1),
            "min_ms": round(min_s * 1e3, 2)}


VARIANTS = {
    "b512": dict(batch=512),
    "b1024": dict(batch=1024),
    "b256": dict(batch=256),
    "einsum": dict(batch=512, attn_impl="einsum"),
    "mlp_pallas": dict(batch=512, mlp_impl="pallas"),
    "ln_bf16": dict(batch=512, ln_dtype="bfloat16"),
    # full final block (cls_only_last=False): the pre-round-3 default,
    # kept for A/B against the class-token-only default
    "full_last": dict(batch=512, cls_only_last=False),
    # alias retained for older PERF.md commands; now same as b512
    "cls_last": dict(batch=512, cls_only_last=True),
    # attention-kernel images-per-grid-step sweep (default 16)
    "attn_g8": dict(batch=512, attn_block=8),
    "attn_g32": dict(batch=512, attn_block=32),
    # images packed per MXU dot (block-diagonal masked logits; default 1)
    "attn_p4": dict(batch=512, attn_pack=4),
    "attn_p8": dict(batch=512, attn_pack=8),
    "attn_p16": dict(batch=512, attn_pack=16),
    "attn_p8_g32": dict(batch=512, attn_pack=8, attn_block=32),
    # all heads folded into one pair of batched dots per grid step
    "attn_hb": dict(batch=512, head_batch=True),
    # bf16 logits buffer + softmax arithmetic inside the fused kernel
    # (non-parity dtype; fp32 is the default — see flash_attn.SOFTMAX_DTYPE)
    "attn_bf16sm": dict(batch=512, softmax_dtype="bfloat16"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="b512,b1024")
    args = ap.parse_args()
    for v in args.variants.split(","):
        v = v.strip()
        print(json.dumps(run_variant(v, **VARIANTS[v])), flush=True)


if __name__ == "__main__":
    main()
