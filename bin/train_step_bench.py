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
                 precision: str | None = None,
                 overrides: list | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from lossyless_tpu.compressors.compressor import LearnableCompressor
    from lossyless_tpu.core.timing import pipelined_iqm
    from lossyless_tpu.pipeline.config import preset
    from lossyless_tpu.pipeline.run import instantiate_datamodule
    from lossyless_tpu.train.state import TrainState

    from lossyless_tpu.pipeline.config import apply_precision

    cfg = preset(name)
    if overrides:
        from lossyless_tpu.pipeline.config import apply_overrides
        cfg = apply_overrides(cfg, list(overrides))
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

    # XLA's own FLOP count for the compiled K-step program -> the
    # peak-rate bound (the train-step analogue of the encode chapter's
    # 22.9 ms Dense-stack bound, PERF.md). Unavailable on some backends.
    flops_per_step = None
    try:
        # k_steps is already jitted: lower() on it reuses the compiled
        # executable's cache key (an outer jax.jit() wrapper would force a
        # second full XLA compile of the K-step program just to read costs)
        ca = k_steps.lower(state, 999).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca and "flops" in ca:
            flops_per_step = float(ca["flops"]) / K
    except Exception:
        pass

    holder = {"state": state}

    def dispatch(r):
        holder["state"], loss = k_steps(holder["state"], r)
        return loss

    iqm_s, min_s = pipelined_iqm(dispatch, reps=reps, depth=2)
    ms = 1e3 * iqm_s / K
    rec = {
        "preset": name,
        "overrides": list(overrides or ()),
        "precision": cfg.trainer.precision,
        "batch": batch,
        "ms_per_step": round(ms, 2),
        "ms_per_step_min": round(1e3 * min_s / K, 2),
        "img_per_sec": round(batch / (iqm_s / K), 1),
        "final_loss_finite": bool(np.isfinite(float(loss))),
    }
    if flops_per_step:
        # single source for the v5e peak so train MFU stays comparable to
        # the encode bench's device_mfu
        from bench import PEAK_BF16_FLOPS as PEAK
        rec["flops_per_step"] = round(flops_per_step)
        rec["peak_bound_ms"] = round(1e3 * flops_per_step / PEAK, 2)
        rec["frac_of_peak_bound"] = round(
            (flops_per_step / PEAK) / (iqm_s / K), 3)
    return rec


def bench_encoder_only(name: str, batch: int, reps: int,
                       precision: str | None = None) -> dict:
    """Empirical encoder floor: fwd+bwd of the ENCODER ALONE (same arch,
    same batch, L2 toy loss) scanned K steps — what the preset's train step
    would cost if rate/distortion/online/optimizer were free. The marginal
    of everything else = full step - this."""
    import jax
    import jax.numpy as jnp

    from lossyless_tpu.compressors.compressor import CondEncoder
    from lossyless_tpu.core.timing import pipelined_iqm
    from lossyless_tpu.pipeline.config import apply_precision, preset
    from lossyless_tpu.pipeline.run import instantiate_datamodule

    cfg = preset(name)
    if precision:
        cfg.trainer.precision = precision
    cfg = apply_precision(cfg)
    ds = instantiate_datamodule(cfg, cfg.data_feat)
    ccfg = cfg.compressor_config()
    enc = CondEncoder(ccfg.encoder, ccfg.in_shape)

    batch = min(batch, len(ds))
    x = jnp.asarray(next(ds.batches(batch, n_epochs=1, seed=0))[0])
    variables = enc.init({"params": jax.random.key(0)}, x, training=True)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p, x):
        out = enc.apply({"params": p, **rest}, x, training=True,
                        mutable=list(rest.keys()) or False)
        dist = out[0] if isinstance(out, tuple) else out
        return jnp.mean(jnp.square(dist.mean.astype(jnp.float32)))

    K = 4

    @jax.jit
    def k_steps(p, seed):
        def body(p, _):
            l, g = jax.value_and_grad(loss_fn)(p, x)
            # consume the grads so XLA cannot DCE the backward pass
            p = jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
            return p, l
        p, ls = jax.lax.scan(body, p, None, length=K)
        return p, ls[-1]

    params, loss = k_steps(params, 0)
    jax.block_until_ready(loss)
    holder = {"p": params}

    def dispatch(r):
        holder["p"], loss = k_steps(holder["p"], r)
        return loss

    iqm_s, min_s = pipelined_iqm(dispatch, reps=reps, depth=2)
    return {
        "preset": name,
        "variant": "encoder_only_fwd_bwd",
        "precision": cfg.trainer.precision,
        "batch": batch,
        "ms_per_step": round(1e3 * iqm_s / K, 2),
        "img_per_sec": round(batch / (iqm_s / K), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default=",".join(PRESETS))
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8, help="timed windows")
    ap.add_argument("--precision", default=None, choices=[None, "fp32",
                                                          "bf16"])
    ap.add_argument("--ab-concat", action="store_true",
                    help="A/B the fused 2B-view contrastive forward "
                         "(distortion.concat_views) on each preset")
    ap.add_argument("--override", action="append", default=[],
                    help="dotted config override (repeatable)")
    ap.add_argument("--attribution", action="store_true",
                    help="floor-attribution sweep per preset: full step, "
                         "no-online, MI-rate (no EB/side nets), encoder-only"
                         " fwd+bwd floor, + XLA FLOP peak-rate bound")
    args = ap.parse_args()
    for name in args.presets.split(","):
        name = name.strip()
        if args.attribution:
            sweep = [("full", []),
                     ("no_online", ["online.is_online=false"]),
                     ("rate_MI", ["rate.mode=MI"])]
            recs = {}
            for label, ov in sweep:
                rec = bench_preset(name, args.batch, args.steps,
                                   precision=args.precision,
                                   overrides=args.override + ov)
                rec["variant"] = label
                recs[label] = rec
                print(json.dumps(rec), flush=True)
            enc = bench_encoder_only(name, args.batch, args.steps,
                                     precision=args.precision)
            print(json.dumps(enc), flush=True)
            full = recs["full"]["ms_per_step"]
            print(json.dumps({
                "preset": name, "variant": "attribution_summary",
                "full_ms": full,
                "online_marginal_ms": round(
                    full - recs["no_online"]["ms_per_step"], 2),
                "rate_marginal_ms": round(
                    full - recs["rate_MI"]["ms_per_step"], 2),
                "encoder_floor_ms": enc["ms_per_step"],
                # what distortion+loss+optimizer cost beyond the bare
                # encoder once the rate nets are removed
                "residual_ms": round(
                    recs["rate_MI"]["ms_per_step"] - enc["ms_per_step"], 2),
                "peak_bound_ms": recs["full"].get("peak_bound_ms"),
                "frac_of_peak_bound": recs["full"].get("frac_of_peak_bound"),
            }), flush=True)
            continue
        variants = [args.override]
        if args.ab_concat:
            variants = [args.override + ["distortion.concat_views=false"],
                        args.override + ["distortion.concat_views=true"]]
        for ov in variants:
            rec = bench_preset(name, args.batch, args.steps,
                               precision=args.precision, overrides=ov)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
