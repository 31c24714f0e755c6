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
    # Mosaic requires a 32-bit matmul accumulator, so the logits dot always
    # produces fp32; SOFTMAX_DTYPE only narrows the max/exp/sum chain
    sm_dtype = SOFTMAX_DTYPE
    scale = jnp.asarray(d**-0.5, sm_dtype)
    for h in range(heads):
        q = qkv_ref[:, :, h * d:(h + 1) * d]
        k = qkv_ref[:, :, D + h * d:D + (h + 1) * d]
        v = qkv_ref[:, :, 2 * D + h * d:2 * D + (h + 1) * d]
        # (G, N, d) x (G, N, d) -> (G, N, N), batched over the image block
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(sm_dtype) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        attn = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(out_ref.dtype)
        o = jax.lax.dot_general(attn, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        out_ref[:, :, h * d:(h + 1) * d] = o.astype(out_ref.dtype)


# Images per Pallas grid step for the full attention kernel. 16 keeps the
# per-step VMEM footprint (qkv block + per-head fp32 logits) comfortably
# under budget; overridable for block-size experiments (device_step_bench
# variants attn_g8/attn_g32).
BLOCK_LIMIT = 16

# Images PACKED PER MXU DOT inside the kernel (1 = one batched dot per
# head over (G, N, d) operands, i.e. G separate N x N problems). With
# pack=P > 1, P images' tokens are stacked into one (P*N, d) operand and
# the logits become a (P*N, P*N) matmul with a block-diagonal additive
# mask: P^2/P = P x the dot FLOPs, but ~P x fewer MXU ops each P x closer
# to the 128-wide tile, attacking the small-dot latency floor that
# dominates attention's cost at N=50, d=64 (PERF.md round-4 ablation).
# Numerics are exact: masked logits underflow to exp(-1e9)=0 in fp32.
# MEASURED (PERF.md round 4): a full-tower loss at P=4/8 — the P^2 softmax
# and logits-buffer growth swamp the dot-count saving. Default stays 1.
IMAGE_PACK = 1

# Head-batched dots: instead of looping `for h in heads` with two (G, N, d)
# batched dots each, fold the head axis into the dot batch dimension — two
# dot_general ops per grid step over (G*H, N, d) operands. Same FLOPs and
# the same per-tile MXU work, H x fewer issued instructions; costs one
# sublane-transpose relayout per operand ((G, N, H, d) -> (G, H, N, d)).
# Opt-in for A/B via device_step_bench variant attn_hb.
HEAD_BATCH = False

# Dtype of the softmax arithmetic (max/exp/sum) inside the fused kernel
# (per-head and cls paths). The logits MXU dot itself always accumulates
# fp32 (Mosaic rejects bf16 matmul accumulators); with bf16 the product is
# narrowed before the reduction chain, halving its VPU traffic and the
# (G, N, N) live buffer. fp32 is the reference-parity default (torch
# computes fp16-input softmax in fp32 too); the per-row sum spans only
# N=50 bf16 terms so the bf16 error stays ~1e-2 relative, but it is NOT
# the parity dtype: opt-in A/B knob (device_step_bench variant
# attn_bf16sm).
SOFTMAX_DTYPE = jnp.float32


def _block_size(B: int, limit: int | None = None) -> int:
    if limit is None:
        limit = BLOCK_LIMIT
    for g in range(min(limit, B), 0, -1):
        if B % g == 0:
            return g
    return 1


def use_pallas_backend() -> bool:
    """True on real TPU backends (the single source of this probe —
    nn.vit and nn.clip_resnet pick their attention impl through it)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _resolve_interpret(interpret) -> bool:
    """None -> interpreter mode on non-TPU backends (CPU tests)."""
    if interpret is None:
        return not use_pallas_backend()
    return interpret


def _vmem_block_limit(per_image_bytes: int, budget: int = 4 << 20) -> int:
    """Cap images-per-grid-step so the main input block fits the budget.

    BLOCK_LIMIT=16 was sized for the ViT's bf16 (N=50, 3D=2304) qkv blocks
    (~3.7 MiB); wider/fp32 callers (e.g. the RN50 attention pool's
    (N, 2*2048) fp32 kv) must scale G down or Mosaic runs out of VMEM.
    """
    return max(1, min(BLOCK_LIMIT, budget // max(1, per_image_bytes)))


def _attn_kernel_packed(qkv_ref, amask_ref, out_ref, *, heads: int,
                        pack: int):
    """Per head, stack `pack` images' tokens into ONE (pack*N, d) operand:
    logits are a single (pack*N, pack*N) MXU dot; the additive mask kills
    cross-image blocks before softmax (exact: exp(-1e9) == 0 in fp32)."""
    G, N, threeD = qkv_ref.shape
    D = threeD // 3
    d = D // heads
    scale = d**-0.5
    M = pack * N
    for s in range(G // pack):
        b0 = s * pack
        for h in range(heads):
            q = qkv_ref[b0:b0 + pack, :, h * d:(h + 1) * d].reshape(M, d)
            k = qkv_ref[b0:b0 + pack, :,
                        D + h * d:D + (h + 1) * d].reshape(M, d)
            v = qkv_ref[b0:b0 + pack, :,
                        2 * D + h * d:2 * D + (h + 1) * d].reshape(M, d)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = logits + amask_ref[:]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            attn = (p / jnp.sum(p, axis=-1,
                                keepdims=True)).astype(out_ref.dtype)
            o = jax.lax.dot_general(attn, v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            out_ref[b0:b0 + pack, :, h * d:(h + 1) * d] = \
                o.astype(out_ref.dtype).reshape(pack, N, d)


def _attn_kernel_headbatched(qkv_ref, out_ref, *, heads: int):
    """All heads in ONE pair of batched dots per grid step (see HEAD_BATCH).

    Head extraction uses sublane-axis concatenation of lane-aligned d-wide
    slices (head-major (H*G, N, d) operands) — Mosaic rejects the
    lane-splitting reshape (G, N, H*d) -> (G, N, H, d)."""
    G, N, threeD = qkv_ref.shape
    D = threeD // 3
    d = D // heads
    scale = d**-0.5

    def heads_first(base):
        return jnp.concatenate(
            [qkv_ref[:, :, base + h * d:base + (h + 1) * d]
             for h in range(heads)], axis=0)

    q = heads_first(0)
    k = heads_first(D)
    v = heads_first(2 * D)
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    attn = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(out_ref.dtype)
    o = jax.lax.dot_general(attn, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    for h in range(heads):
        out_ref[:, :, h * d:(h + 1) * d] = \
            o[h * G:(h + 1) * G].astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_attention(qkv: jnp.ndarray, heads: int,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Fused MHSA from a (B, N, 3D) qkv tensor -> (B, N, D).

    `interpret=True` runs the kernel in the Pallas interpreter; the default
    (None) picks it automatically on non-TPU backends. With IMAGE_PACK > 1
    the packed-dot kernel stacks that many images per MXU dot (see the
    IMAGE_PACK note above).
    """
    interpret = _resolve_interpret(interpret)
    B, N, threeD = qkv.shape
    D = threeD // 3
    per_img = N * threeD * jnp.dtype(qkv.dtype).itemsize
    G = _block_size(B, _vmem_block_limit(per_img))
    pack = min(IMAGE_PACK, G)
    while G % pack:
        pack -= 1
    if (pack > 1 or HEAD_BATCH) and SOFTMAX_DTYPE != jnp.float32:
        # the packed and head-batched kernels hardcode fp32 softmax (their
        # logits buffers are fp32 accumulators); silently ignoring the knob
        # would make an attn_p*/attn_hb + bf16-softmax A/B measure nothing
        raise NotImplementedError(
            "SOFTMAX_DTYPE != float32 is only honored by the per-head and "
            "cls kernels; unset IMAGE_PACK/HEAD_BATCH or keep fp32 softmax")
    if pack > 1:
        # rebudget the block size for the packed buffers: per image the
        # kernel additionally holds its share of the fp32 (M, M) logits /
        # exp / mask blocks (3 * pack * N^2 * 4 bytes) plus the output
        # block — the qkv-only budget above would blow VMEM at pack>=8
        per_img_packed = (per_img + N * D * jnp.dtype(qkv.dtype).itemsize
                          + 3 * pack * N * N * 4)
        lim = max(pack, _vmem_block_limit(per_img_packed))
        G = next(g for g in range(min(lim, B), pack - 1, -1)
                 if B % g == 0 and g % pack == 0)
        M = pack * N
        img = jnp.arange(M, dtype=jnp.int32) // N
        amask = jnp.where(img[:, None] == img[None, :], 0.0,
                          -1e9).astype(jnp.float32)
        kernel = functools.partial(_attn_kernel_packed, heads=heads,
                                   pack=pack)
        return pl.pallas_call(
            kernel,
            grid=(B // G,),
            in_specs=[pl.BlockSpec((G, N, threeD), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      # constant block: fetched into VMEM once, rides
                      # across the whole grid
                      pl.BlockSpec((M, M), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
            interpret=interpret,
        )(qkv, amask)
    if HEAD_BATCH:
        # fp32 logits for ALL heads live at once: (G*H, N, N); budget the
        # block size for them alongside the qkv block
        per_img_hb = per_img + heads * N * N * 4 + N * D * 2
        G = _block_size(B, _vmem_block_limit(per_img_hb))
        kernel = functools.partial(_attn_kernel_headbatched, heads=heads)
    else:
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


# ---------------------------------------------------------------------------
# Class-token-only attention: queries for token 0 only.
#
# In the LAST transformer block of the CLIP tower only the class token's
# output is ever read (ln_post consumes x[:, 0] — nn/vit.py). Its attention
# needs keys/values for every token but queries for token 0 alone, so the
# logits shrink from (B, h, N, N) to (B, h, 1, N) and the q projection /
# output projection / MLP run on one token instead of N — the exact same
# arithmetic on the class-token row, just skipping rows nothing consumes
# (~7% of the tower's FLOPs at ViT-B/32 shapes).
# ---------------------------------------------------------------------------


def _reference_attention_cls(q0: jnp.ndarray, kv: jnp.ndarray,
                             heads: int) -> jnp.ndarray:
    """Einsum attention for 1-token queries. q0 (B,1,D), kv (B,N,2D)."""
    B, N, twoD = kv.shape
    D = twoD // 2
    d = D // heads
    k, v = jnp.split(kv, 2, axis=-1)
    q = q0.reshape(B, 1, heads, d)
    k = k.reshape(B, N, heads, d)
    v = v.reshape(B, N, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * d**-0.5, k,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1).astype(kv.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, 1, D)


def _attn_cls_kernel(q_ref, kv_ref, out_ref, *, heads: int):
    D = out_ref.shape[-1]
    d = D // heads
    sm_dtype = SOFTMAX_DTYPE
    scale = jnp.asarray(d**-0.5, sm_dtype)
    for h in range(heads):
        q = q_ref[:, :, h * d:(h + 1) * d]
        k = kv_ref[:, :, h * d:(h + 1) * d]
        v = kv_ref[:, :, D + h * d:D + (h + 1) * d]
        # (G, 1, d) x (G, N, d) -> (G, 1, N); fp32 acc (Mosaic requirement)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(sm_dtype) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        attn = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(out_ref.dtype)
        o = jax.lax.dot_general(attn, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        out_ref[:, :, h * d:(h + 1) * d] = o.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_attention_cls(q0: jnp.ndarray, kv: jnp.ndarray, heads: int,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Fused MHSA for token-0 queries: (B,1,D) q, (B,N,2D) kv -> (B,1,D)."""
    interpret = _resolve_interpret(interpret)
    B, N, twoD = kv.shape
    D = twoD // 2
    per_img = N * twoD * jnp.dtype(kv.dtype).itemsize
    G = _block_size(B, _vmem_block_limit(per_img))
    kernel = functools.partial(_attn_cls_kernel, heads=heads)
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[pl.BlockSpec((G, 1, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, N, twoD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, 1, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), kv.dtype),
        interpret=interpret,
    )(q0, kv)


def _fused_attention_cls_fwd(q0, kv, heads, interpret):
    return fused_attention_cls(q0, kv, heads, interpret), (q0, kv)


def _fused_attention_cls_bwd(heads, interpret, res, g):
    q0, kv = res
    _, vjp = jax.vjp(lambda q, t: _reference_attention_cls(q, t, heads),
                     q0, kv)
    return vjp(g)


fused_attention_cls.defvjp(_fused_attention_cls_fwd, _fused_attention_cls_bwd)


# ---------------------------------------------------------------------------
# Fused MLP half-block: x + proj(QuickGELU(fc(LN(x))))
#
# Two thirds of the tower's FLOPs are the per-block MLP; XLA materializes the
# (B, N, 4D) hidden activation in HBM between the two matmuls and lays the
# LayerNorm out against the dot's preference. One kernel keeps LN statistics,
# both matmuls, the QuickGELU, and the residual add in VMEM per image block.
# ---------------------------------------------------------------------------


def _reference_mlp_block(x, ln_scale, ln_bias, fc_w, fc_b, pr_w, pr_b,
                         eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * ln_scale + ln_bias).astype(x.dtype)
    h = y @ fc_w.astype(x.dtype) + fc_b.astype(x.dtype)
    h = h * jax.nn.sigmoid(1.702 * h)
    return x + (h @ pr_w.astype(x.dtype) + pr_b.astype(x.dtype))


def _mlp_kernel(x_ref, lns_ref, lnb_ref, fcw_ref, fcb_ref, prw_ref, prb_ref,
                out_ref, *, eps: float):
    G, N, D = x_ref.shape
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * lns_ref[:].astype(jnp.float32)
         + lnb_ref[:].astype(jnp.float32)).astype(x.dtype)
    h = jax.lax.dot_general(
        y.reshape(G * N, D), fcw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = (h.astype(x.dtype) + fcb_ref[:])
    # QuickGELU with every constant dtype-pinned: Mosaic rejects the weak
    # f32 scalar broadcasts jax.nn.sigmoid's lowering produces for bf16
    one = jnp.asarray(1.0, h.dtype)
    h = h * (one / (one + jnp.exp(jnp.asarray(-1.702, h.dtype) * h)))
    o = jax.lax.dot_general(
        h, prw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = x + (o.astype(x.dtype) + prb_ref[:]).reshape(G, N, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_mlp_block(x, ln_scale, ln_bias, fc_w, fc_b, pr_w, pr_b,
                    eps: float = 1e-5, block_b: int = 8,
                    interpret: bool | None = None):
    """`x + proj(QuickGELU(fc(LayerNorm(x))))` as one Pallas kernel.

    Weights ride in VMEM across the whole grid (their block index is
    constant, so they are fetched once); the (G, N, 4D) hidden never touches
    HBM. Backward recomputes through the reference formulation.
    """
    interpret = _resolve_interpret(interpret)
    B, N, D = x.shape
    G = _block_size(B, block_b)
    H4 = fc_w.shape[1]
    # weights ride in VMEM in the compute dtype (fp32 masters would double
    # the ~9.4MB footprint past the VMEM budget)
    fc_w, fc_b = fc_w.astype(x.dtype), fc_b.astype(x.dtype)
    pr_w, pr_b = pr_w.astype(x.dtype), pr_b.astype(x.dtype)

    def vspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps),
        grid=(B // G,),
        in_specs=[
            vspec((G, N, D), lambda i: (i, 0, 0)),
            vspec((1, D), lambda i: (0, 0)),
            vspec((1, D), lambda i: (0, 0)),
            vspec((D, H4), lambda i: (0, 0)),
            vspec((1, H4), lambda i: (0, 0)),
            vspec((H4, D), lambda i: (0, 0)),
            vspec((1, D), lambda i: (0, 0)),
        ],
        out_specs=vspec((G, N, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        interpret=interpret,
    )(x, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
      fc_w, fc_b.reshape(1, H4), pr_w, pr_b.reshape(1, D))


def _fused_mlp_fwd(x, lns, lnb, fcw, fcb, prw, prb, eps, block_b, interpret):
    out = fused_mlp_block(x, lns, lnb, fcw, fcb, prw, prb, eps, block_b,
                          interpret)
    return out, (x, lns, lnb, fcw, fcb, prw, prb)


def _fused_mlp_bwd(eps, block_b, interpret, res, g):
    _, vjp = jax.vjp(lambda *a: _reference_mlp_block(*a, eps), *res)
    return vjp(g)


fused_mlp_block.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
