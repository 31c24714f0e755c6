"""STL10 BINCE: ResNet encoder + global-batch InfoNCE + factorized rate.

Equivalent of the reference's `bin/stl10` contrastive experiments: two
augmented views per image, InfoNCE over the global batch (BINCE distortion),
entropy-bottleneck rate on the representation. Real STL10 binaries are used
when present under /root/data; otherwise the synthetic fallback exercises
identical machinery.

Usage: python bin/stl10_repro.py [n_epochs] [steps_per_epoch] [batch]
"""

import sys
import time
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
from lossyless_tpu.compressors.rates import RateConfig
from lossyless_tpu.data.images import ImageDataset
from lossyless_tpu.train.metrics import MetricAccumulator
from lossyless_tpu.train.state import (OptimConfig, TrainState, eval_step,
                                       make_generative_epoch)


def main(n_epochs=10, steps_per_epoch=100, batch_size=128):
    train_ds = ImageDataset(name="stl10", split="train",
                            additional_target="equiv_x")
    test_ds = ImageDataset(name="stl10", split="test", is_augment=False,
                           additional_target="equiv_x")
    print(f"data: {'synthetic' if train_ds.synthetic else 'real'} "
          f"({len(train_ds)} train)", flush=True)

    cfg = CompressorConfig(
        encoder=EncoderConfig(arch="resnet", z_dim=128,
                              arch_kwargs=dict(base="resnet18")),
        rate=RateConfig(mode="H_factorized"),
        distortion=DistortionConfig(mode="contrastive", project_dim=128,
                                    temperature=0.01,
                                    effective_batch_size=len(train_ds)),
        online=OnlineEvalConfig(is_online=True,
                                arch_kwargs=dict(hid_dim=512)),
        loss=LossConfig(beta=0.01, beta_anneal="linear",
                        n_steps_anneal=n_epochs * steps_per_epoch // 10),
        in_shape=train_ds.spec.shape,
        target_shape=train_ds.spec.n_classes,
        aux_shape=train_ds.spec.shape,
    )

    sample_fn = train_ds.device_sampler(batch_size)
    model = LearnableCompressor(cfg)
    sample = jax.tree.map(np.asarray, sample_fn(jax.random.key(0)))
    t0 = time.time()
    state = TrainState.create(model, sample, jax.random.key(123),
                              main=OptimConfig(lr=3e-4),
                              online=OptimConfig(lr=1e-3),
                              coder=OptimConfig(lr=3e-4))
    print(f"init {time.time()-t0:.0f}s", flush=True)
    epoch_fn = make_generative_epoch(sample_fn, steps_per_epoch)

    t0 = time.time()
    for epoch in range(n_epochs):
        state, logs = epoch_fn(state, jax.random.key(epoch + 1))
        print(f"epoch {epoch:3d}: rate={float(logs['rate'][-1]):.1f} bits "
              f"I_q_zm={float(logs['I_q_zm'][-1]):.2f} "
              f"online_acc={float(np.asarray(logs.get('online_acc', 0)).reshape(-1)[-1]):.3f} "
              f"({time.time()-t0:.1f}s)", flush=True)

    acc = MetricAccumulator()
    bs = min(512, len(test_ds))
    n_eval = 0
    for i, b in enumerate(test_ds.batches(bs, n_epochs=1, seed=0,
                                          shuffle=False)):
        _, elogs = eval_step(state, b, None)
        acc.update(elogs, weight=len(b[0]))
        n_eval += len(b[0])
        if i >= 3:
            break  # quick-smoke subset; label says so below
    m = acc.means()
    print(f"TEST (first {n_eval} of {len(test_ds)} images): "
          f"rate={m['rate']:.1f} bits online_acc="
          f"{m.get('online_acc', float('nan')):.4f}", flush=True)
    return state, m


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spe = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    bs = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    main(n, spe, bs)
