"""CLIP text tower: shapes, causal masking, EOT pooling, converter layout."""

import jax
import jax.numpy as jnp
import numpy as np

from lossyless_tpu.nn.clip_text import (TextTransformer,
                                        convert_openai_clip_text_weights,
                                        featurize_captions)


def small_text():
    return TextTransformer(vocab_size=100, context_length=16, width=32,
                           layers=2, heads=2, out_dim=24, dtype=jnp.float32)


def make_ids(rng, b, n=16, max_tok=90):
    ids = rng.integers(1, max_tok, (b, n))
    # CLIP convention: EOT is the max id; place it mid-sequence, pad after
    eot_pos = rng.integers(4, n - 1, b)
    for i, p in enumerate(eot_pos):
        ids[i, p] = 99
        ids[i, p + 1:] = 0
    return ids


def test_forward_and_eot_pooling():
    m = small_text()
    rng = np.random.default_rng(0)
    ids = make_ids(rng, 4)
    v = m.init(jax.random.key(0), jnp.asarray(ids))
    z = m.apply(v, jnp.asarray(ids))
    assert z.shape == (4, 24)

    # causal masking + EOT pooling: tokens AFTER the EOT cannot change output
    ids2 = ids.copy()
    for i in range(4):
        p = int(np.argmax(ids[i]))
        ids2[i, p + 1:] = 7  # garbage in the padding region
    z2 = m.apply(v, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-5)

    # tokens BEFORE the EOT do change the output
    ids3 = ids.copy()
    ids3[:, 1] = (ids3[:, 1] % 80) + 2
    z3 = m.apply(v, jnp.asarray(ids3))
    assert not np.allclose(np.asarray(z), np.asarray(z3), atol=1e-4)


def test_text_converter_layout():
    m = small_text()
    ids = jnp.zeros((1, 16), jnp.int32)
    ref = m.init(jax.random.key(0), ids)["params"]

    w, L = 32, 2
    sd = {
        "token_embedding.weight": np.zeros((100, w), np.float32),
        "positional_embedding": np.zeros((16, w), np.float32),
        "ln_final.weight": np.ones((w,), np.float32),
        "ln_final.bias": np.zeros((w,), np.float32),
        "text_projection": np.zeros((w, 24), np.float32),
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
    converted = convert_openai_clip_text_weights(sd)
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(lambda a: a.shape, ref))[0])
    flat_conv = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(lambda a: a.shape, converted))[0])
    assert flat_ref.keys() == flat_conv.keys()
    for k in flat_ref:
        assert flat_ref[k] == flat_conv[k], k


def test_featurize_captions_batching():
    m = small_text()
    rng = np.random.default_rng(1)
    ids = make_ids(rng, 10)
    v = m.init(jax.random.key(0), jnp.asarray(ids[:2]))

    import lossyless_tpu.nn.clip_text as ct
    orig = ct.TextTransformer
    try:
        ct.TextTransformer = lambda dtype: small_text()  # shim for the test
        out = featurize_captions(v["params"], ids, batch_size=4)
    finally:
        ct.TextTransformer = orig
    assert out.shape == (10, 24)
