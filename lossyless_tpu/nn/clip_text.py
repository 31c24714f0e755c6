"""CLIP text encoder (transformer tower), TPU-native.

The reference uses CLIP's text encoder once, at dataset-build time, to
pre-featurize COCO captions as contrastive positives
(`/root/reference/utils/data/images.py:1297-1326`). This module provides the
same capability: token ids -> 512-d text embeddings aligned with the visual
tower, with an OpenAI-weight converter.

Tokenization (the byte-pair-encoding vocab) is a data file users supply with
their CLIP weights; this module consumes already-tokenized, 77-padded id
sequences (standard CLIP contract: <start> tokens <end> padding, and the
sequence is pooled at the <end> token = the per-row argmax id).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class CausalMHSA(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        h = self.heads
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, h, D // h).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, h, D // h).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, h, D // h).transpose(0, 2, 1, 3)
        scale = (D // h) ** -0.5
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        causal = jnp.tril(jnp.ones((N, N), bool))
        attn = jnp.where(causal[None, None], attn, -jnp.inf)
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)


class TextBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5, name="ln_1")(x).astype(self.dtype)
        x = x + CausalMHSA(self.width, self.heads, self.dtype, name="attn")(y)
        y = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5, name="ln_2")(x).astype(self.dtype)
        y = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_fc")(y)
        y = y * nn.sigmoid(1.702 * y)  # QuickGELU
        y = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(y)
        return x + y


class TextTransformer(nn.Module):
    """CLIP text tower: (B, 77) int token ids -> (B, out_dim) embeddings."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    out_dim: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, token_ids):
        tok = self.param("token_embedding",
                         nn.initializers.normal(0.02),
                         (self.vocab_size, self.width))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = tok[token_ids].astype(self.dtype)
        x = x + pos.astype(self.dtype)[None, : x.shape[1]]
        for i in range(self.layers):
            x = TextBlock(self.width, self.heads, self.dtype,
                          name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5, name="ln_final")(x)
        # pool at the <end> token (highest token id per row, CLIP convention)
        eot = jnp.argmax(token_ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.out_dim))
        out = pooled.astype(self.dtype) @ proj.astype(self.dtype)
        return out.astype(jnp.float32)


def convert_openai_clip_text_weights(torch_state_dict) -> dict:
    """Map OpenAI CLIP text-side weights onto this module's param tree."""
    sd = {k: np.asarray(v.float().cpu().numpy() if hasattr(v, "cpu") else v,
                        np.float32)
          for k, v in torch_state_dict.items()}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "ln_final": ln("ln_final"),
        "text_projection": sd["text_projection"],
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        p = f"transformer.resblocks.{i}"
        params[f"block{i}"] = {
            "ln_1": ln(f"{p}.ln_1"),
            "ln_2": ln(f"{p}.ln_2"),
            "attn": {
                "qkv": {"kernel": sd[f"{p}.attn.in_proj_weight"].T,
                        "bias": sd[f"{p}.attn.in_proj_bias"]},
                "proj": {"kernel": sd[f"{p}.attn.out_proj.weight"].T,
                         "bias": sd[f"{p}.attn.out_proj.bias"]},
            },
            "mlp_fc": {"kernel": sd[f"{p}.mlp.c_fc.weight"].T,
                       "bias": sd[f"{p}.mlp.c_fc.bias"]},
            "mlp_proj": {"kernel": sd[f"{p}.mlp.c_proj.weight"].T,
                         "bias": sd[f"{p}.mlp.c_proj.bias"]},
        }
        i += 1
    return params


def featurize_captions(params, token_ids, batch_size: int = 256,
                       dtype=jnp.bfloat16) -> np.ndarray:
    """Embed tokenized captions in batches (the COCO pre-featurization step)."""
    model = TextTransformer(dtype=dtype)
    fn = jax.jit(lambda ids: model.apply({"params": params}, ids))
    out = []
    ids = np.asarray(token_ids)
    for i in range(0, len(ids), batch_size):
        out.append(np.asarray(fn(jnp.asarray(ids[i:i + batch_size]))))
    return np.concatenate(out) if out else np.empty((0, 512), np.float32)
