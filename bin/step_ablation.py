"""Attribute the encode device step's time to tower components (PERF.md).

The pure-matmul bound says ~23 ms/512 imgs for the Dense/MLP stack; the
measured default step is ~33-37 ms. This script measures, on the real chip
in one process, what each component contributes by ABLATION — identical
tower with one component group skipped — plus an empirical matmul floor
(the exact Dense-stack matmuls with no LN / attention / nonlinearities /
residuals). Differences between variants attribute the step time:

    attention marginal = full - no_attn
    MLP marginal       = full - no_mlp
    LN marginal        = full - no_ln
    scheduling residue = no_attn+no_mlp overlap vs matmul_floor

Usage: python bin/step_ablation.py [--variants full,no_attn,...] [--reps 12]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import flax.linen as nn
import jax
import jax.numpy as jnp

from lossyless_tpu.core.timing import pipelined_iqm


class AblBlock(nn.Module):
    """vit.Block with skippable component groups (ablation only)."""

    width: int
    heads: int
    skip_attn: bool = False
    skip_mlp: bool = False
    skip_ln: bool = False

    @nn.compact
    def __call__(self, x):
        from lossyless_tpu.nn.vit import MHSA

        dt = jnp.bfloat16

        def maybe_ln(name, v):
            if self.skip_ln:
                return v
            return nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5,
                                name=name)(v).astype(dt)

        y = maybe_ln("ln_1", x)
        if not self.skip_attn:
            x = x + MHSA(self.width, self.heads, dt, "auto", name="attn")(y)
        if not self.skip_mlp:
            y = maybe_ln("ln_2", x)
            y = nn.Dense(4 * self.width, dtype=dt, name="mlp_fc")(y)
            y = y * nn.sigmoid(1.702 * y)
            y = nn.Dense(self.width, dtype=dt, name="mlp_proj")(y)
            x = x + y
        return x


class AblVit(nn.Module):
    """vit.VisionTransformer with skippable groups (full-block layout —
    no cls-only last block, so marginals subtract cleanly)."""

    skip_attn: bool = False
    skip_mlp: bool = False
    skip_ln: bool = False
    width: int = 768
    layers: int = 12
    heads: int = 12
    out_dim: int = 512

    @nn.compact
    def __call__(self, x):
        from lossyless_tpu.nn.vit import PatchEmbed

        dt = jnp.bfloat16
        B = x.shape[0]
        x = PatchEmbed(self.width, 32, dt, name="patch_embed")(x.astype(dt))
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (B, 1, self.width)), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02),
                         (x.shape[1], self.width))
        x = x + pos.astype(dt)[None]
        if not self.skip_ln:
            x = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5,
                             name="ln_pre")(x).astype(dt)
        for i in range(self.layers):
            x = AblBlock(self.width, self.heads, self.skip_attn,
                         self.skip_mlp, self.skip_ln, name=f"block{i}")(x)
        x = x[:, 0]
        if not self.skip_ln:
            x = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5,
                             name="ln_post")(x)
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.out_dim))
        return (x.astype(dt) @ proj.astype(dt)).astype(jnp.float32)


class MatmulFloor(nn.Module):
    """The Dense-stack matmuls ONLY, at the exact tower shapes.

    patchify (B*49, 3072)@(3072,768), then per block (B*50,768)@(768,2304)
    -> slice 768 -> @(768,768) -> @(768,3072) -> @(3072,768), final
    (B,768)@(768,512). No LN, no attention dots, no nonlinearity, no
    residual: the empirical speed-of-light of the matmul work.
    """

    width: int = 768
    layers: int = 12
    out_dim: int = 512

    @nn.compact
    def __call__(self, x):
        from lossyless_tpu.nn.vit import PatchEmbed

        dt = jnp.bfloat16
        B = x.shape[0]
        x = PatchEmbed(self.width, 32, dt, name="patch_embed")(x.astype(dt))
        x = jnp.concatenate([x[:, :1], x], axis=1)  # 49 -> 50 tokens
        D = self.width
        for i in range(self.layers):
            qkv = nn.Dense(3 * D, dtype=dt, use_bias=True,
                           name=f"qkv{i}")(x)
            x = nn.Dense(D, dtype=dt, name=f"proj{i}")(qkv[..., :D])
            h = nn.Dense(4 * D, dtype=dt, name=f"fc{i}")(x)
            x = nn.Dense(D, dtype=dt, name=f"prj{i}")(h)
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (D, self.out_dim))
        return (x[:, 0] @ proj.astype(dt)).astype(jnp.float32)


def time_step(model_apply, params, batch: int, reps: int) -> dict:
    """device-step ms via the depth-2 pipeline + IQM gap statistic
    (same methodology as bin/device_step_bench.py)."""
    import numpy as np  # noqa: F401

    from lossyless_tpu.nn.vit import CLIP_MEAN, CLIP_STD

    norm_a = jnp.asarray(1.0 / (255.0 * CLIP_STD), jnp.bfloat16)
    norm_b = jnp.asarray(-CLIP_MEAN / CLIP_STD, jnp.bfloat16)

    @jax.jit
    def step(params, bits, salt):
        xb = bits ^ salt
        x = xb.astype(jnp.bfloat16) * norm_a + norm_b
        z = model_apply(params, x)
        return jnp.sum(z.astype(jnp.float32))  # scalar out: no readback tax

    bits = jax.random.bits(jax.random.key(0), (batch, 224, 224, 3),
                           jnp.uint8)
    jax.block_until_ready(step(params, bits, jnp.uint8(255)))
    best, min_s = pipelined_iqm(
        lambda r: step(params, bits, jnp.uint8(r)), reps)
    return {"ms_per_batch": round(best * 1e3, 2),
            "min_ms": round(min_s * 1e3, 2),
            "img_per_sec_device": round(batch / best, 1)}


VARIANTS: dict[str, Any] = {
    "full": dict(),
    "no_attn": dict(skip_attn=True),
    "no_mlp": dict(skip_mlp=True),
    "no_ln": dict(skip_ln=True),
    "attn_ln_only": dict(skip_mlp=True, skip_ln=False),
    "matmul_floor": "floor",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="full,no_attn,no_mlp,no_ln,matmul_floor")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=12)
    args = ap.parse_args()

    for name in args.variants.split(","):
        name = name.strip()
        spec = VARIANTS[name]
        model = MatmulFloor() if spec == "floor" else AblVit(**spec)
        params = model.init(jax.random.key(0),
                            jnp.zeros((8, 224, 224, 3)))["params"]
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        apply_fn = lambda p, x: model.apply({"params": p}, x)  # noqa: E731
        r = time_step(apply_fn, params, args.batch, args.reps)
        print(json.dumps({"variant": name, "batch": args.batch, **r}),
              flush=True)


if __name__ == "__main__":
    main()
