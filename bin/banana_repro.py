"""Banana VIC/VAE reproduction at reference scale, fully on-device.

Reproduces `bin/banana/banana_viz_VIC.sh` (reference targets:
VIC rate 4.83 bits / distortion 0.051; VAE rate 4.83 / 0.109 —
results/exp_banana_viz_VIC/summarized_metrics_merged.csv) with the fused
generative-epoch trainer: sampling + group actions + 1000 updates run as one
XLA program per epoch.

Usage: python bin/banana_repro.py [VIC|VAE] [n_epochs]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from lossyless_tpu.compressors.compressor import LearnableCompressor
from lossyless_tpu.data.banana import device_sample_batch
from lossyless_tpu.pipeline.config import preset
from lossyless_tpu.train.state import (TrainState, bind_schedule_steps, eval_step,
                                       make_generative_epoch)


def main(mode="VIC", n_epochs=100, batch_size=1024, steps_per_epoch=1000):
    cfg = preset("banana_viz_VIC" if mode == "VIC" else "banana_viz_VAE")
    cfg.data_feat.n_epochs = n_epochs
    cfg.in_shape, cfg.target_shape, cfg.aux_shape = (2,), 1, 2

    additional = "representative" if mode == "VIC" else "input"

    def sample_fn(key):
        return device_sample_batch(key, batch_size,
                                   additional_target=additional)

    model = LearnableCompressor(cfg.compressor_config())
    sample = jax.tree.map(np.asarray, sample_fn(jax.random.key(0)))
    state = TrainState.create(model, sample, jax.random.key(cfg.trainer.seed),
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
        if epoch % 10 == 0 or epoch == n_epochs - 1:
            print(f"epoch {epoch:3d}: rate={float(logs['rate'][-1]):.3f} bits "
                  f"dist={float(logs['distortion'][-1]):.4f} "
                  f"loss={float(logs['loss'][-1]):.4f} "
                  f"({time.time()-t0:.1f}s)", flush=True)

    # eval on fresh samples
    from lossyless_tpu.train.metrics import MetricAccumulator
    acc = MetricAccumulator()
    for i in range(10):
        batch = sample_fn(jax.random.key(10_000 + i))
        _, logs = eval_step(state, batch, None)
        acc.update(logs, weight=batch_size)
    m = acc.means()
    print(f"FINAL {mode}: rate={m['rate']:.3f} bits "
          f"distortion={m['distortion']:.4f} "
          f"online_loss={m.get('online_loss', float('nan')):.4f}")
    # reference results/exp_banana_viz_VIC/summarized_metrics_merged.csv:
    # VIC test/feat/rate 2.302 @ distortion 0.0513; VAE 4.830 @ 0.1089
    ref_rate, ref_dist = (2.30, "0.051") if mode == "VIC" else (4.83, "0.109")
    print(f"reference: rate={ref_rate} distortion={ref_dist}")

    # artifacts: weights + the paper's codebook / maxinv figures
    out = Path(f"/tmp/banana_{mode.lower()}_artifacts")
    out.mkdir(exist_ok=True)
    from lossyless_tpu.train.checkpoints import save_weights
    save_weights(out / "best_featurizer", jax.device_get(state.params))

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    featurize = jax.jit(lambda x: model.apply(variables, x, method="features"))

    def decode(z):
        def fn(m, z):
            return m.distortion_estimator.reconstruct(z)
        return np.asarray(model.apply(variables, jnp.asarray(z), method=fn))

    from lossyless_tpu.analysis.visualize import (codebook_plot,
                                                  maxinv_distribution_plot)
    codebook_plot(lambda p: np.asarray(featurize(jnp.asarray(p))), decode,
                  out / "codebook.png", xlim=(-4, 4), ylim=(-4, 4),
                  n_grid=150)
    from lossyless_tpu.data.banana import BananaDataset
    ds = BananaDataset(length=20000)
    maxinv_distribution_plot(ds.data, ds.max_invariant, out / "maxinv.png")
    print(f"artifacts -> {out}")
    return state, m


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "VIC"
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    main(mode, n_epochs)
