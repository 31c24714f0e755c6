"""Pallas fused attention: equivalence with the einsum path (fwd + grad)."""

import jax
import jax.numpy as jnp
import numpy as np

from lossyless_tpu.nn.flash_attn import _reference_attention, fused_attention


def _qkv(B=8, N=50, D=96, dtype=jnp.float32):
    return jax.random.normal(jax.random.key(0), (B, N, 3 * D), dtype)


def test_forward_matches_einsum():
    qkv = _qkv()
    out_k = fused_attention(qkv, 4, True)  # interpret mode (CPU)
    out_r = _reference_attention(qkv, 4)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)


def test_forward_matches_einsum_bf16():
    qkv = _qkv(dtype=jnp.bfloat16)
    out_k = fused_attention(qkv, 4, True).astype(jnp.float32)
    out_r = _reference_attention(qkv, 4).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-2)


def test_packed_kernel_matches_einsum():
    """IMAGE_PACK > 1 (block-diagonal masked big dots) is numerically
    exact vs the per-head path: masked logits underflow to exactly 0."""
    from lossyless_tpu.nn import flash_attn

    qkv = _qkv(B=8, N=50, D=96)
    ref = _reference_attention(qkv, 4)
    saved = flash_attn.IMAGE_PACK
    try:
        for pack in (2, 4, 8):
            flash_attn.IMAGE_PACK = pack
            out = fused_attention(qkv, 4, True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)
        # pack larger than the image block clamps to the block size
        flash_attn.IMAGE_PACK = 64
        out = fused_attention(qkv, 4, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # non-divisible pack falls back to the largest divisor
        flash_attn.IMAGE_PACK = 3
        out = fused_attention(qkv, 4, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
    finally:
        flash_attn.IMAGE_PACK = saved


def test_headbatched_kernel_matches_einsum():
    """HEAD_BATCH folds all heads into one batched dot pair — numerics
    match the per-head path (same dots, different batching)."""
    from lossyless_tpu.nn import flash_attn

    saved = flash_attn.HEAD_BATCH
    try:
        flash_attn.HEAD_BATCH = True
        for dtype, tol in ((jnp.float32, dict(rtol=1e-5, atol=1e-5)),
                           (jnp.bfloat16, dict(atol=2e-2))):
            qkv = _qkv(dtype=dtype)
            out = fused_attention(qkv, 4, True).astype(jnp.float32)
            ref = _reference_attention(qkv, 4).astype(jnp.float32)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       **tol)
    finally:
        flash_attn.HEAD_BATCH = saved


def test_softmax_dtype_bf16_close_to_fp32():
    """SOFTMAX_DTYPE=bf16 (opt-in A/B knob) stays within bf16 rounding of
    the fp32-softmax default on both the full and cls kernels — the
    per-row sum spans only N terms, so no catastrophic accumulation."""
    from lossyless_tpu.nn import flash_attn
    from lossyless_tpu.nn.flash_attn import fused_attention_cls

    qkv = _qkv(B=8, N=50, D=96, dtype=jnp.bfloat16)
    kv = qkv[:, :, 96:]  # (B, N, 2D) for the cls kernel
    q0 = qkv[:, :1, :96]
    ref = _reference_attention(qkv, 4).astype(jnp.float32)
    ref_cls = fused_attention_cls(q0, kv, 4, True).astype(jnp.float32)
    saved = flash_attn.SOFTMAX_DTYPE
    try:
        flash_attn.SOFTMAX_DTYPE = jnp.bfloat16
        out = fused_attention(qkv, 4, True).astype(jnp.float32)
        out_cls = fused_attention_cls(q0, kv, 4, True).astype(jnp.float32)
    finally:
        flash_attn.SOFTMAX_DTYPE = saved
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2)
    np.testing.assert_allclose(np.asarray(out_cls), np.asarray(ref_cls),
                               atol=3e-2)


def test_packed_kernel_grad_routes_through_einsum():
    from lossyless_tpu.nn import flash_attn

    qkv = _qkv(B=4, N=10, D=32)
    saved = flash_attn.IMAGE_PACK
    try:
        flash_attn.IMAGE_PACK = 4
        g1 = jax.grad(lambda t: fused_attention(t, 4, True).sum())(qkv)
    finally:
        flash_attn.IMAGE_PACK = saved
    g2 = jax.grad(lambda t: _reference_attention(t, 4).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_grad_routes_through_einsum():
    """custom_vjp backward must equal differentiating the einsum directly."""
    qkv = _qkv(B=2, N=10, D=32)
    g1 = jax.grad(lambda t: fused_attention(t, 4, True).sum())(qkv)
    g2 = jax.grad(lambda t: _reference_attention(t, 4).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_fused_mlp_block_matches_reference():
    from lossyless_tpu.nn.flash_attn import (_reference_mlp_block,
                                             fused_mlp_block)

    D = 64
    ks = jax.random.split(jax.random.key(1), 7)
    x = jax.random.normal(ks[0], (4, 10, D), jnp.float32)
    args = (x,
            jax.random.normal(ks[1], (D,)) * 0.1 + 1,
            jax.random.normal(ks[2], (D,)) * 0.1,
            jax.random.normal(ks[3], (D, 4 * D)) * 0.05,
            jax.random.normal(ks[4], (4 * D,)) * 0.05,
            jax.random.normal(ks[5], (4 * D, D)) * 0.05,
            jax.random.normal(ks[6], (D,)) * 0.05)
    out_k = fused_mlp_block(*args, 1e-5, 8, True)
    out_r = _reference_mlp_block(*args)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda *a: fused_mlp_block(*a, 1e-5, 8, True).sum())(*args)
    g2 = jax.grad(lambda *a: _reference_mlp_block(*a).sum())(*args)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_vit_mlp_impl_pallas_same_tree_and_output():
    """mlp_impl=pallas keeps the param tree and the numerics."""
    from lossyless_tpu.nn.vit import VisionTransformer

    kw = dict(patch_size=32, width=64, layers=2, heads=2, out_dim=16,
              dtype=jnp.float32, attn_impl="einsum")
    m0 = VisionTransformer(**kw)
    m1 = VisionTransformer(mlp_impl="pallas", **kw)
    x = jax.random.normal(jax.random.key(0), (2, 224, 224, 3))
    v0 = m0.init(jax.random.key(1), x)
    v1 = m1.init(jax.random.key(1), x)
    t0 = jax.tree_util.tree_structure(v0)
    t1 = jax.tree_util.tree_structure(v1)
    assert t0 == t1
    z0 = m0.apply(v0, x)
    z1 = m1.apply(v0, x)  # same params through the fused path
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1),
                               rtol=1e-4, atol=1e-4)


def test_odd_batch_sizes():
    """Block size falls back to a divisor of B (worst case 1)."""
    for B in (1, 3, 7):
        qkv = _qkv(B=B, N=5, D=32)
        out_k = fused_attention(qkv, 2, True)
        out_r = _reference_attention(qkv, 2)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-5)


def test_cls_attention_matches_full_token0_row():
    """fused_attention_cls == the class-token row of full attention."""
    from lossyless_tpu.nn.flash_attn import (_reference_attention_cls,
                                             fused_attention_cls)

    qkv = _qkv(B=8, N=50, D=96)
    D = 96
    q0 = qkv[:, :1, :D]
    kv = qkv[:, :, D:]
    full = _reference_attention(qkv, 4)[:, :1]
    out_r = _reference_attention_cls(q0, kv, 4)
    out_k = fused_attention_cls(q0, kv, 4, True)  # interpret mode (CPU)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(full),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_cls_attention_grad_routes_through_einsum():
    from lossyless_tpu.nn.flash_attn import (_reference_attention_cls,
                                             fused_attention_cls)

    q0 = jax.random.normal(jax.random.key(1), (2, 1, 32))
    kv = jax.random.normal(jax.random.key(2), (2, 10, 64))
    g1 = jax.grad(lambda q, t: fused_attention_cls(q, t, 4, True).sum(),
                  argnums=(0, 1))(q0, kv)
    g2 = jax.grad(lambda q, t: _reference_attention_cls(q, t, 4).sum(),
                  argnums=(0, 1))(q0, kv)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
