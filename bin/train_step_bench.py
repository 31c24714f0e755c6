"""Training-step throughput for the main recipe families (device-measured).

The deployment encode path is benchmarked by bench.py; this harness measures
the TRAINING hot loop — the fused single-jit update (RD + online probe +
coder aux, `train/state.py`) — for representative presets, with synthetic
device-resident batches so the number is pure device step time:

    banana_viz_VIC   mlp_fancy encoder + H_factorized + direct  (toy)
    mnist_vic        resnet18 + H_hyper + direct                (small images)
    stl10_bince      resnet18 + H_hyper + contrastive InfoNCE   (96px)
    clip_lossyZ      frozen ViT-B/32 + H_factorized + lossy_Z   (flagship)

Reports ms/step and img/s per preset as one JSON line each (IQM over
pipelined windows, same methodology as bin/device_step_bench.py). The
reference publishes no training-throughput numbers; these document this
framework's own training speed and catch step-time regressions.

Usage: python bin/train_step_bench.py [--presets a,b] [--batch 256] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

PRESETS = ("banana_viz_VIC", "mnist_vic", "stl10_bince", "clip_lossyZ")


def bench_preset(name: str, batch: int, reps: int,
                 precision: str | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from lossyless_tpu.compressors.compressor import LearnableCompressor
    from lossyless_tpu.core.timing import pipelined_iqm
    from lossyless_tpu.pipeline.config import preset
    from lossyless_tpu.pipeline.run import instantiate_datamodule
    from lossyless_tpu.train.state import TrainState

    from lossyless_tpu.pipeline.config import apply_precision

    cfg = preset(name)
    if precision:
        cfg.trainer.precision = precision
    cfg = apply_precision(cfg)  # same resolution the pipeline applies
    # bind shapes exactly as the pipeline does; the batch comes from the
    # real dataset object (synthetic fallback in this env), so the (x, y,
    # aux) contract is exact for every preset
    ds = instantiate_datamodule(cfg, cfg.data_feat)
    model = LearnableCompressor(cfg.compressor_config())

    # clamp like the pipeline does: batches() drops the last partial batch,
    # so --batch > len(ds) would otherwise yield nothing (StopIteration)
    batch = min(batch, len(ds))
    host = next(ds.batches(batch, n_epochs=1, seed=0))
    batch_dev = jax.device_put(tuple(jnp.asarray(a) for a in host))
    state = TrainState.create(model, batch_dev, jax.random.key(0),
                              main=cfg.optimizer_feat,
                              online=cfg.optimizer_online,
                              coder=cfg.optimizer_coder,
                              frozen_paths=tuple(cfg.frozen))

    # train_step donates state: benchmark via a scan of K steps so one
    # dispatch = K updates (the real pipeline's fused-epoch shape), and the
    # per-step cost excludes dispatch overhead
    K = 4

    from lossyless_tpu.train.state import _train_step_inner

    @jax.jit
    def k_steps(state, seed):
        def body(st, key):
            st, logs = _train_step_inner(st, batch_dev, key)
            return st, logs["loss"]
        keys = jax.random.split(jax.random.key(seed), K)
        state, losses = jax.lax.scan(body, state, keys)
        return state, losses[-1]

    state, loss = k_steps(state, 999)  # compile + warm
    jax.block_until_ready(loss)

    holder = {"state": state}

    def dispatch(r):
        holder["state"], loss = k_steps(holder["state"], r)
        return loss

    iqm_s, min_s = pipelined_iqm(dispatch, reps=reps, depth=2)
    ms = 1e3 * iqm_s / K
    return {
        "preset": name,
        "precision": cfg.trainer.precision,
        "batch": batch,
        "ms_per_step": round(ms, 2),
        "ms_per_step_min": round(1e3 * min_s / K, 2),
        "img_per_sec": round(batch / (iqm_s / K), 1),
        "final_loss_finite": bool(np.isfinite(float(loss))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default=",".join(PRESETS))
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8, help="timed windows")
    ap.add_argument("--precision", default=None, choices=[None, "fp32",
                                                          "bf16"])
    args = ap.parse_args()
    for name in args.presets.split(","):
        rec = bench_preset(name.strip(), args.batch, args.steps,
                           precision=args.precision)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
