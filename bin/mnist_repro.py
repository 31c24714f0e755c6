"""AugMNIST VIC reproduction: CNN encoder + hyperprior on augmented MNIST.

Reference target (results/exp_augmnist_viz_VIC): VIC H_hyper z=128 beta=0.1
-> n_bits 1735.5/img (bpp 1.695), pred acc 97.15%. Runs on real MNIST if
present in /root/data, otherwise the synthetic class-structured fallback
(machinery identical; absolute numbers then aren't comparable).

The whole epoch (index sampling + device augmentation + updates) is one
fused XLA program per `make_generative_epoch`.

Usage: python bin/mnist_repro.py [n_epochs] [steps_per_epoch]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from lossyless_tpu.compressors.compressor import LearnableCompressor
from lossyless_tpu.data.images import ImageDataset
from lossyless_tpu.pipeline.config import preset
from lossyless_tpu.pipeline.predictor import PredictorTrainer, featurize_dataset
from lossyless_tpu.train.metrics import MetricAccumulator
from lossyless_tpu.train.state import (TrainState, bind_schedule_steps, eval_step,
                                       make_generative_epoch)


def main(n_epochs=20, steps_per_epoch=200, batch_size=256):
    cfg = preset("mnist_vic")
    train_ds = ImageDataset(name="mnist", split="train",
                            additional_target="representative")
    test_ds = ImageDataset(name="mnist", split="test", is_augment=False,
                           additional_target="representative")
    print(f"data: {'synthetic' if train_ds.synthetic else 'real'} "
          f"({len(train_ds)} train / {len(test_ds)} test)", flush=True)

    cfg.in_shape = train_ds.spec.shape
    cfg.target_shape = train_ds.spec.n_classes
    cfg.aux_shape = train_ds.spec.shape

    sample_fn = train_ds.device_sampler(batch_size)
    model = LearnableCompressor(cfg.compressor_config())
    sample = jax.tree.map(np.asarray, sample_fn(jax.random.key(0)))
    state = TrainState.create(model, sample, jax.random.key(123),
                              main=bind_schedule_steps(
                                  cfg.optimizer_feat, n_epochs * steps_per_epoch),
                              online=bind_schedule_steps(
                                  cfg.optimizer_online, n_epochs * steps_per_epoch),
                              coder=bind_schedule_steps(
                                  cfg.optimizer_coder, n_epochs * steps_per_epoch))
    epoch_fn = make_generative_epoch(sample_fn, steps_per_epoch)

    t0 = time.time()
    for epoch in range(n_epochs):
        state, logs = epoch_fn(state, jax.random.key(epoch + 1))
        if epoch % 5 == 0 or epoch == n_epochs - 1:
            print(f"epoch {epoch:3d}: rate={float(logs['rate'][-1]):.1f} bits "
                  f"dist={float(logs['distortion'][-1]):.1f} "
                  f"online_acc={float(np.asarray(logs.get('online_acc', 0)).reshape(-1)[-1]):.3f} "
                  f"({time.time()-t0:.1f}s)", flush=True)

    # eval (theoretical rate + online acc on un-augmented test set)
    acc = MetricAccumulator()
    bs = min(1024, len(test_ds))
    for i, b in enumerate(test_ds.batches(bs, n_epochs=1, seed=0,
                                          shuffle=False, drop_last=False)):
        _, elogs = eval_step(state, b, None)
        acc.update(elogs, weight=len(b[0]))
    m = acc.means()
    bpp = m["rate"] / (32 * 32)
    print(f"TEST: rate={m['rate']:.1f} bits ({bpp:.3f} bpp) "
          f"online_acc={m.get('online_acc', float('nan')):.4f}", flush=True)

    # downstream predictor on frozen features
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    feat_fn = jax.jit(lambda x: model.apply(variables, x, method="features"))
    # full splits (ragged tail padded to one compiled shape) — dropping
    # the tail would quote accuracy on ~92% of the split
    z_tr, y_tr = featurize_dataset(
        feat_fn, train_ds.batches(bs, n_epochs=1, seed=0, shuffle=False,
                                  drop_last=False), pad_to=bs)
    z_te, y_te = featurize_dataset(
        feat_fn, test_ds.batches(bs, n_epochs=1, seed=0, shuffle=False,
                                 drop_last=False), pad_to=bs)
    pt = PredictorTrainer(cfg.predictor, z_tr.shape[-1], cfg.target_shape)
    pt.fit(z_tr, y_tr, seed=0)
    pm = pt.evaluate(z_te, y_te)
    print(f"PRED: acc={pm['acc']:.4f} (reference real-MNIST: 0.9715, "
          f"n_bits 1735.5)", flush=True)
    return m, pm


if __name__ == "__main__":
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spe = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    main(n_epochs, spe)
