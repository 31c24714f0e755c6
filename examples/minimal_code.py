"""Minimal compressor training — the reference's `minimal_code.ipynb` flow.

Paper Appendix E.7 protocol (reference notebooks/minimal_code.ipynb):

1. featurize a dataset with a FROZEN pretrained encoder (CLIP in the paper;
   here any (N, d) feature array — plug your own, or use the synthetic
   CLIP-like features below for a self-contained run),
2. train a factorized entropy bottleneck on those features with the lossy_Z
   distortion (compress Z while preserving what a probe needs),
3. compress a *different* dataset's features to real bitstreams with rANS,
4. train a LinearSVC on the DECOMPRESSED features — accuracy should match
   the uncompressed probe at ~1.5-2 kbit/img.

Run: `python examples/minimal_code.py` (CPU ok; TPU just faster).
With real CLIP weights: featurize with `nn.vit` + `convert_openai_clip_weights`.
"""

import jax
import numpy as np

from lossyless_tpu.analysis.linear_eval import z_linear_eval
from lossyless_tpu.compressors.compressor import (CompressorConfig,
                                                  EncoderConfig,
                                                  LearnableCompressor,
                                                  LossConfig,
                                                  OnlineEvalConfig)
from lossyless_tpu.compressors.distortions import DistortionConfig
from lossyless_tpu.compressors.rates import FactorizedCoder, RateConfig
from lossyless_tpu.data.features import FeaturesDataset
from lossyless_tpu.train.state import (OptimConfig, TrainState,
                                       make_generative_epoch)


def synthetic_clip_features(n, d=64, n_classes=10, seed=0):
    """Stand-in for CLIP embeddings: class-clustered unit-norm vectors."""
    centers = np.random.default_rng(42).normal(0, 1, (n_classes, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    y = rng.integers(0, n_classes, n)
    z = centers[y] + rng.normal(0, 0.25, (n, d))
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    return z.astype(np.float32), y


def main(d=64, beta=0.01, n_epochs=20):
    # -- 1. "featurized" data (swap in real CLIP features here) -------------
    z_tr, y_tr = synthetic_clip_features(4000, d)
    z_te, y_te = synthetic_clip_features(1000, d, seed=1)

    # -- 2. entropy bottleneck on features (bottleneck_clip_lossyZ) ---------
    cfg = CompressorConfig(
        encoder=EncoderConfig(arch="identity", z_dim=d),
        rate=RateConfig(mode="H_factorized", eb_filters=(3, 3, 3, 3)),
        distortion=DistortionConfig(mode="lossy_Z", p_norm=1),
        online=OnlineEvalConfig(is_online=False),
        loss=LossConfig(beta=beta, beta_anneal="constant"),
        in_shape=(d,), target_shape=10, aux_shape=(d,),
    )
    model = LearnableCompressor(cfg)
    ds = FeaturesDataset(z_tr, y_tr, additional_target="target")
    sample_fn = ds.device_sampler(256)
    sample = jax.tree.map(np.asarray, sample_fn(jax.random.key(0)))
    state = TrainState.create(model, sample, jax.random.key(0),
                              main=OptimConfig(lr=1e-3),
                              coder=OptimConfig(lr=1e-3))
    epoch_fn = make_generative_epoch(sample_fn, 100)
    for e in range(n_epochs):
        state, logs = epoch_fn(state, jax.random.key(e + 1))
    print(f"trained: loss={float(logs['loss'][-1]):.3f} "
          f"rate={float(logs['rate'][-1]):.2f} bits")

    # -- 3. real coding (CDF tables + rANS) ---------------------------------
    params = jax.device_get(state.params)
    coder = FactorizedCoder({
        "affine": params["rate_estimator"]["affine"],
        "entropy_bottleneck": params["rate_estimator"]["entropy_bottleneck"]})
    s_tr, s_te = coder.compress(z_tr), coder.compress(z_te)
    zc_tr, zc_te = coder.decompress(s_tr), coder.decompress(s_te)
    bits = 8 * np.mean([len(s) for s in s_te])
    print(f"coded rate: {bits:.1f} bits/sample")

    # -- 4. probe on decompressed features ----------------------------------
    base = z_linear_eval(z_tr, y_tr, z_te, y_te, fixed_C=0.1)
    comp = z_linear_eval(zc_tr, y_tr, zc_te, y_te, fixed_C=0.1)
    print(f"probe acc: raw={base['acc']:.4f} compressed={comp['acc']:.4f}")
    return bits, base["acc"], comp["acc"]


if __name__ == "__main__":
    main()
