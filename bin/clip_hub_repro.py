"""Train the three hub compressors (b001/b005/b01) and export hub weights.

Equivalent of the reference's `bin/clip/clip_hub.sh`: train the CLIP-feature
entropy bottleneck at β ∈ {1e-2, 5e-2, 1e-1} with lossy_Z distortion, then
export rate-estimator-only checkpoints in the hub format
(`utils/save_hub.py` semantics).

With no network egress, features come from real CLIP embeddings on disk
(`--features feats.npz` with features/targets arrays) or a synthetic
CLIP-like distribution (machinery-identical; rates then aren't comparable).

Usage: python bin/clip_hub_repro.py [--features feats.npz] [--out hub_out]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from lossyless_tpu.compressors.compressor import (CompressorConfig,
                                                  EncoderConfig,
                                                  LearnableCompressor,
                                                  LossConfig,
                                                  OnlineEvalConfig)
from lossyless_tpu.compressors.distortions import DistortionConfig
from lossyless_tpu.compressors.rates import FactorizedCoder, RateConfig
from lossyless_tpu.data.features import FeaturesDataset
from lossyless_tpu.hub.save_hub import save_hub
from lossyless_tpu.train.state import (OptimConfig, TrainState,
                                       make_generative_epoch)

BETAS = {"b001": 1e-2, "b005": 5e-2, "b01": 1e-1}


def synthetic_clip_features(n=20000, d=512, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.normal(0, 0.35, (n, d)).astype(np.float32)
    z /= np.linalg.norm(z, axis=1, keepdims=True) / 10.0  # CLIP-norm scale
    return z, rng.integers(0, 10, n)


def train_one(features, targets, beta, n_epochs=15, steps=200, batch=512):
    d = features.shape[1]
    cfg = CompressorConfig(
        encoder=EncoderConfig(arch="identity", z_dim=d),
        rate=RateConfig(mode="H_factorized", eb_filters=(3, 3, 3, 3)),
        distortion=DistortionConfig(mode="lossy_Z", p_norm=1),
        online=OnlineEvalConfig(is_online=False),
        loss=LossConfig(beta=beta, beta_anneal="constant"),
        in_shape=(d,), target_shape=int(targets.max()) + 1, aux_shape=(d,))
    ds = FeaturesDataset(features, targets, additional_target="target")
    model = LearnableCompressor(cfg)
    sample_fn = ds.device_sampler(batch)
    state = TrainState.create(
        model, jax.tree.map(np.asarray, sample_fn(jax.random.key(0))),
        jax.random.key(0), main=OptimConfig(lr=1e-3),
        coder=OptimConfig(lr=1e-3))
    epoch_fn = make_generative_epoch(sample_fn, steps)
    logs = None
    for e in range(n_epochs):
        state, logs = epoch_fn(state, jax.random.key(e + 1))
    if logs is None:  # --epochs 0: export/round-trip smoke without training
        return state, float("nan"), float("nan")
    return state, float(logs["rate"][-1]), float(logs["distortion"][-1])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", default=None)
    ap.add_argument("--out", default="hub_out")
    ap.add_argument("--epochs", type=int, default=15)
    args = ap.parse_args(argv)

    if args.features:
        data = np.load(args.features)
        feats, targets = data["features"], data["targets"]
        src = args.features
    else:
        feats, targets = synthetic_clip_features()
        src = "synthetic"

    for name, beta in BETAS.items():
        state, rate, dist = train_one(feats, targets, beta, args.epochs)
        out = save_hub(jax.device_get(state.params), args.out, beta)
        # round-trip sanity: real coding with the exported weights
        params = jax.device_get(state.params)
        coder = FactorizedCoder({
            "affine": params["rate_estimator"]["affine"],
            "entropy_bottleneck":
                params["rate_estimator"]["entropy_bottleneck"]})
        sample = feats[:256]
        streams = coder.compress(sample)
        # decode must reproduce the quantized latents exactly
        z_in = coder.process_in(sample)
        expected = coder.process_out(
            np.round(z_in - coder.medians[None]) + coder.medians[None])
        assert np.allclose(coder.decompress(streams), expected, atol=1e-5)
        bits = 8 * np.mean([len(s) for s in streams])
        print(f"{name} (beta={beta}, data={src}): train rate={rate:.1f} bits "
              f"coded={bits:.1f} bits/img -> {out}", flush=True)


if __name__ == "__main__":
    main()
