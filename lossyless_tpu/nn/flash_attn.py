"""Fused multi-head self-attention for short token sequences (Pallas, TPU).

The CLIP ViT-B/32 tower (`nn/vit.py`) attends over only 50 tokens with 12
heads of 64 dims — shapes far below the MXU's 128x128 tile. Left to XLA, the
per-head einsums force transposed layouts on everything around them: the
preceding LayerNorm is written strided, q/k/v are re-laid-out through
explicit `copy` ops, and the (B, h, N, N) fp32 logits round-trip HBM. On a
profiled 512-image forward this layout thrash (copies + convert/reduce
fusions) costs ~30ms of a 67ms step — more than the transformer's matmuls.

This kernel takes the fused qkv projection in its NATURAL (B, N, 3D) layout,
keeps logits/softmax entirely in VMEM, and writes the output back in natural
(B, N, D) layout, so no layout constraint leaks into the surrounding graph.
Heads are static lane-slices of the 3D-wide qkv tile (d=64-aligned), per-head
attention is a pair of batched MXU dots over the image block.

Backward runs through the plain einsum formulation via custom_vjp (training
recomputes attention; the hot deployment path is forward-only).

Reference parity: replaces `nn.MultiheadAttention` inside CLIP's resblocks
(/root/reference/hub/compressor.py:39-40 runs torch's fused attention in
fp16); numerics match the einsum path to bf16 tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_attention(qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Plain einsum attention on a fused (B, N, 3D) qkv tensor."""
    B, N, threeD = qkv.shape
    D = threeD // 3
    d = D // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, N, heads, d)
    k = k.reshape(B, N, heads, d)
    v = v.reshape(B, N, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * d**-0.5, k,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, D)


def _attn_kernel(qkv_ref, out_ref, *, heads: int):
    D = out_ref.shape[-1]
    d = D // heads
    scale = d**-0.5
    for h in range(heads):
        q = qkv_ref[:, :, h * d:(h + 1) * d]
        k = qkv_ref[:, :, D + h * d:D + (h + 1) * d]
        v = qkv_ref[:, :, 2 * D + h * d:2 * D + (h + 1) * d]
        # (G, N, d) x (G, N, d) -> (G, N, N), batched over the image block
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        attn = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(out_ref.dtype)
        o = jax.lax.dot_general(attn, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        out_ref[:, :, h * d:(h + 1) * d] = o.astype(out_ref.dtype)


def _block_size(B: int, limit: int = 16) -> int:
    for g in range(min(limit, B), 0, -1):
        if B % g == 0:
            return g
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_attention(qkv: jnp.ndarray, heads: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused MHSA from a (B, N, 3D) qkv tensor -> (B, N, D).

    `interpret=True` runs the kernel in the Pallas interpreter (CPU tests).
    """
    B, N, threeD = qkv.shape
    D = threeD // 3
    G = _block_size(B)
    kernel = functools.partial(_attn_kernel, heads=heads)
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[pl.BlockSpec((G, N, threeD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        interpret=interpret,
    )(qkv)


def _fused_attention_fwd(qkv, heads, interpret):
    return fused_attention(qkv, heads, interpret), qkv


def _fused_attention_bwd(heads, interpret, qkv, g):
    # backward through the einsum formulation (recompute; exact same math)
    _, vjp = jax.vjp(lambda t: _reference_attention(t, heads), qkv)
    return vjp(g)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
