"""Attention-kernel-only microbench: time fused_attention across IMAGE_PACK.

Times JUST the attention kernel on the ViT-B/32 hot shape (B, 50, 2304) —
one tiny program per variant, so it survives degraded-tunnel sessions where
the full tower sweep (bin/device_step_bench.py) cannot compile. The full-
tower A/B remains the deciding measurement; this isolates the kernel delta.

Per step the jitted program runs the kernel LAYERS times back-to-back (like
the tower does) so per-dispatch overhead amortizes.

Usage: python bin/attn_kernel_bench.py [--packs 1,4,8,16] [--batch 512]
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


def time_variant(pack: int, batch: int, layers: int = 11,
                 reps: int = 12) -> dict:
    from lossyless_tpu.nn import flash_attn

    saved = flash_attn.IMAGE_PACK
    flash_attn.IMAGE_PACK = pack
    try:
        heads = 12

        @jax.jit
        def step(qkv, salt):
            # per-layer distinct inputs (defeats CSE); the elementwise add
            # + scalar reduce around each call is a CONSTANT tax across
            # variants, so pack deltas stay interpretable
            acc = jnp.float32(0)
            for i in range(layers):
                out = flash_attn.fused_attention(qkv + salt * (i + 1), heads)
                acc += jnp.sum(out.astype(jnp.float32))
            return acc

        qkv = jax.random.normal(jax.random.key(0), (batch, 50, 2304),
                                jnp.bfloat16)
        jax.block_until_ready(step(qkv, jnp.bfloat16(0.5)))
        best, min_s = pipelined_iqm(
            lambda r: step(qkv, jnp.bfloat16(float(r))), reps)
        return {"pack": pack, "batch": batch, "layers": layers,
                "ms_per_step": round(best * 1e3, 2),
                "ms_per_layer_call": round(best * 1e3 / layers, 3),
                "min_ms": round(min_s * 1e3, 2)}
    finally:
        flash_attn.IMAGE_PACK = saved


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packs", default="1,4,8,16")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--layers", type=int, default=11)
    args = ap.parse_args()
    for p in args.packs.split(","):
        r = time_variant(int(p), args.batch, args.layers)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
