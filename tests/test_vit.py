"""CLIP ViT-B/32: forward shapes, preprocessing, weight-converter layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lossyless_tpu.nn.vit import (VisionTransformer, clip_preprocess,
                                  convert_openai_clip_weights, vit_b32)


def small_vit():
    return VisionTransformer(patch_size=32, width=64, layers=2, heads=2,
                             out_dim=32, dtype=jnp.float32)


def test_forward_shapes():
    m = small_vit()
    x = jnp.zeros((3, 224, 224, 3))
    v = m.init(jax.random.key(0), x)
    z = m.apply(v, x)
    assert z.shape == (3, 32)
    assert z.dtype == jnp.float32


def test_clip_preprocess():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 300, 260, 3)).astype(np.float32))
    out = clip_preprocess(x)
    assert out.shape == (2, 224, 224, 3)
    # normalized: roughly zero-mean given uniform input
    assert abs(float(out.mean())) < 2.0


def test_weight_converter_layout():
    """A fake OpenAI-style state dict converts to exactly our param tree."""
    m = small_vit()
    x = jnp.zeros((1, 224, 224, 3))
    ref = m.init(jax.random.key(0), x)["params"]

    w, L, heads, out = 64, 2, 2, 32
    sd = {
        "conv1.weight": np.zeros((w, 3, 32, 32), np.float32),  # OIHW
        "class_embedding": np.zeros((w,), np.float32),
        "positional_embedding": np.zeros((50, w), np.float32),
        "ln_pre.weight": np.ones((w,), np.float32),
        "ln_pre.bias": np.zeros((w,), np.float32),
        "ln_post.weight": np.ones((w,), np.float32),
        "ln_post.bias": np.zeros((w,), np.float32),
        "proj": np.zeros((w, out), np.float32),
    }
    for i in range(L):
        p = f"transformer.resblocks.{i}"
        sd.update({
            f"{p}.ln_1.weight": np.ones((w,), np.float32),
            f"{p}.ln_1.bias": np.zeros((w,), np.float32),
            f"{p}.ln_2.weight": np.ones((w,), np.float32),
            f"{p}.ln_2.bias": np.zeros((w,), np.float32),
            f"{p}.attn.in_proj_weight": np.zeros((3 * w, w), np.float32),
            f"{p}.attn.in_proj_bias": np.zeros((3 * w,), np.float32),
            f"{p}.attn.out_proj.weight": np.zeros((w, w), np.float32),
            f"{p}.attn.out_proj.bias": np.zeros((w,), np.float32),
            f"{p}.mlp.c_fc.weight": np.zeros((4 * w, w), np.float32),
            f"{p}.mlp.c_fc.bias": np.zeros((4 * w,), np.float32),
            f"{p}.mlp.c_proj.weight": np.zeros((w, 4 * w), np.float32),
            f"{p}.mlp.c_proj.bias": np.zeros((w,), np.float32),
        })

    converted = convert_openai_clip_weights(sd)

    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    conv_shapes = jax.tree.map(lambda a: a.shape, converted)
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_shapes)[0])
    flat_conv = dict(jax.tree_util.tree_flatten_with_path(conv_shapes)[0])
    assert flat_ref.keys() == flat_conv.keys()
    for k in flat_ref:
        assert flat_ref[k] == flat_conv[k], k

    # converted weights actually run through apply
    z = m.apply({"params": jax.tree.map(jnp.asarray, converted)}, x)
    assert z.shape == (1, 32)


def test_contrastive_already_featurized():
    """BINCE with pre-featurized positives (CLIP-caption path)."""
    from lossyless_tpu.compressors.compressor import (
        CompressorConfig, EncoderConfig, LearnableCompressor, LossConfig,
        OnlineEvalConfig)
    from lossyless_tpu.compressors.distortions import DistortionConfig
    from lossyless_tpu.compressors.rates import RateConfig
    from lossyless_tpu.train.state import OptimConfig, TrainState, train_step

    d = 16
    cfg = CompressorConfig(
        encoder=EncoderConfig(arch="identity", z_dim=d),
        rate=RateConfig(mode="H_factorized"),
        distortion=DistortionConfig(mode="contrastive", project_dim=16,
                                    temperature=0.1,
                                    is_already_featurized=True),
        online=OnlineEvalConfig(is_online=False),
        loss=LossConfig(beta=0.05, beta_anneal="constant"),
        in_shape=(d,), target_shape=2, aux_shape=(d,),
    )
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (32, d)).astype(np.float32)
    aux = (x + rng.normal(0, 0.1, x.shape)).astype(np.float32)  # positives
    batch = (x, rng.integers(0, 2, 32), aux)
    model = LearnableCompressor(cfg)
    state = TrainState.create(model, batch, jax.random.key(0),
                              main=OptimConfig(lr=1e-3))
    state, logs = train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["I_q_zm"]) != 0.0


def test_remat_matches_forward_and_grads():
    """remat=True must be numerically identical (fwd and grads)."""
    kw = dict(patch_size=32, width=64, layers=2, heads=2, out_dim=16,
              dtype=jnp.float32)
    m0 = VisionTransformer(**kw)
    m1 = VisionTransformer(remat=True, **kw)
    x = jax.random.normal(jax.random.key(0), (2, 224, 224, 3))
    v = m0.init(jax.random.key(1), x)

    z0 = m0.apply(v, x)
    z1 = m1.apply(v, x)  # same param tree (remat doesn't change names)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), atol=1e-6)

    g0 = jax.grad(lambda p: (m0.apply({"params": p}, x) ** 2).sum())(
        v["params"])
    g1 = jax.grad(lambda p: (m1.apply({"params": p}, x) ** 2).sum())(
        v["params"])
    for (a, b) in zip(jax.tree_util.tree_leaves(g0),
                      jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_patch_embed_equals_strided_conv():
    """The matmul patchify is numerically the stride=patch conv it replaces."""
    import jax.numpy as jnp
    from jax import lax
    from lossyless_tpu.nn.vit import PatchEmbed

    m = PatchEmbed(width=16, patch=8, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 24, 24, 5)).astype(np.float32))
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)

    conv = lax.conv_general_dilated(
        x, v["params"]["kernel"], window_strides=(8, 8), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(conv).reshape(3, -1, 16),
                               rtol=1e-5, atol=1e-5)


def test_ln_dtype_knob_matches_fp32():
    """ln_dtype=bfloat16 output stays within bf16 tolerance of fp32 LNs.

    The knob only changes LayerNorm compute dtype (params + tree unchanged),
    so the same variables must apply to both and agree to bf16 rounding.
    """
    m32 = VisionTransformer(patch_size=32, width=64, layers=2, heads=2,
                            out_dim=32, dtype=jnp.float32)
    mbf = VisionTransformer(patch_size=32, width=64, layers=2, heads=2,
                            out_dim=32, dtype=jnp.float32,
                            ln_dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 224, 224, 3)).astype(np.float32))
    v = m32.init(jax.random.key(0), x)
    a = m32.apply(v, x)
    b = mbf.apply(v, x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        mbf.init(jax.random.key(0), x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0.06, atol=0.06)


def test_converter_full_clip_state_dict_ignores_text_tower():
    """A FULL CLIP state dict (visual.* + text transformer.*) must convert
    the visual tower only — stripping 'visual.' naively would let the text
    tower's transformer.resblocks.* overwrite the visual blocks."""
    rng = np.random.default_rng(0)

    def r(*shape):
        return rng.normal(size=shape).astype(np.float32)

    W, LAYERS, PATCH, OUT, TW = 64, 2, 8, 32, 48
    n_tok = (32 // PATCH) ** 2 + 1
    vis = {
        "conv1.weight": r(W, 3, PATCH, PATCH),
        "class_embedding": r(W),
        "positional_embedding": r(n_tok, W),
        "ln_pre.weight": r(W), "ln_pre.bias": r(W),
        "ln_post.weight": r(W), "ln_post.bias": r(W),
        "proj": r(W, OUT),
    }
    for i in range(LAYERS):
        p = f"transformer.resblocks.{i}"
        for nm, shape in (("ln_1.weight", (W,)), ("ln_1.bias", (W,)),
                          ("ln_2.weight", (W,)), ("ln_2.bias", (W,)),
                          ("attn.in_proj_weight", (3 * W, W)),
                          ("attn.in_proj_bias", (3 * W,)),
                          ("attn.out_proj.weight", (W, W)),
                          ("attn.out_proj.bias", (W,)),
                          ("mlp.c_fc.weight", (4 * W, W)),
                          ("mlp.c_fc.bias", (4 * W,)),
                          ("mlp.c_proj.weight", (W, 4 * W)),
                          ("mlp.c_proj.bias", (W,))):
            vis[f"{p}.{nm}"] = r(*shape)

    full = {f"visual.{k}": v for k, v in vis.items()}
    # text tower blocks at a DIFFERENT width — would corrupt shapes if kept
    for i in range(LAYERS):
        full[f"transformer.resblocks.{i}.ln_1.weight"] = r(TW)
        full[f"transformer.resblocks.{i}.attn.in_proj_weight"] = r(3 * TW, TW)
    full["text_projection"] = r(TW, OUT)

    want = convert_openai_clip_weights(vis)
    got = convert_openai_clip_weights(full)
    for (k, v), (_, g) in zip(jax.tree_util.tree_leaves_with_path(want),
                              jax.tree_util.tree_leaves_with_path(got)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(v))


def test_cls_only_last_matches_full_tower():
    """cls_only_last=True: same param tree, same embeddings.

    The final block computes only the class-token row; since ln_post reads
    x[:, 0] exclusively this is the exact same arithmetic (skipped rows feed
    nothing), so the fp32 outputs must agree tightly.
    """
    kw = dict(patch_size=32, width=64, layers=2, heads=2, out_dim=32,
              dtype=jnp.float32, attn_impl="einsum")
    m_full = VisionTransformer(cls_only_last=False, **kw)
    m_cls = VisionTransformer(cls_only_last=True, **kw)
    x = jax.random.normal(jax.random.key(0), (3, 224, 224, 3))
    v = m_full.init(jax.random.key(1), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(m_cls.init(jax.random.key(1), x)))
    z_full = m_full.apply(v, x)
    z_cls = m_cls.apply(v, x)  # same params through the cls-only path
    np.testing.assert_allclose(np.asarray(z_cls), np.asarray(z_full),
                               rtol=1e-5, atol=1e-5)


def test_cls_only_last_pallas_interpret():
    """The Pallas cls kernel path agrees with the einsum path end-to-end."""
    kw = dict(patch_size=32, width=64, layers=2, heads=2, out_dim=32,
              dtype=jnp.float32, cls_only_last=True)
    m_e = VisionTransformer(attn_impl="einsum", **kw)
    m_p = VisionTransformer(attn_impl="pallas", **kw)  # interpret on CPU
    x = jax.random.normal(jax.random.key(0), (2, 224, 224, 3))
    v = m_e.init(jax.random.key(1), x)
    np.testing.assert_allclose(np.asarray(m_p.apply(v, x)),
                               np.asarray(m_e.apply(v, x)),
                               rtol=1e-4, atol=1e-4)
