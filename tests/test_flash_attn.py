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


def test_grad_routes_through_einsum():
    """custom_vjp backward must equal differentiating the einsum directly."""
    qkv = _qkv(B=2, N=10, D=32)
    g1 = jax.grad(lambda t: fused_attention(t, 4, True).sum())(qkv)
    g2 = jax.grad(lambda t: _reference_attention(t, 4).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_odd_batch_sizes():
    """Block size falls back to a divisor of B (worst case 1)."""
    for B in (1, 3, 7):
        qkv = _qkv(B=B, N=5, D=32)
        out_k = fused_attention(qkv, 2, True)
        out_r = _reference_attention(qkv, 2)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-5)
