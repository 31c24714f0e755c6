"""CLI entry point: `python -m lossyless_tpu.cli <preset> [overrides...]`.

Equivalent of the reference's hydra entry `python main.py <overrides>`
(`/root/reference/main.py:88`): pick a preset experiment, apply dotted
overrides, run the 3-stage pipeline, print the resulting metrics.

Example:
    python -m lossyless_tpu.cli banana_viz_VIC loss.beta=0.07 \
        data_feat.n_epochs=50 trainer.seed=123
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    from .core.mesh import respect_platform_env
    from .pipeline.config import available_presets

    # honor `JAX_PLATFORMS=cpu python -m lossyless_tpu.cli ...` even when a
    # site hook pre-imported jax with a stale platform default
    respect_platform_env()

    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog="presets: " + ", ".join(available_presets()))
    parser.add_argument("preset",
                        help="experiment preset name (see list below) or "
                             "'default'")
    parser.add_argument("overrides", nargs="*",
                        help="dotted overrides key=value")
    parser.add_argument("--dev", action="store_true",
                        help="dev mode: cap epochs/batches (config/mode/dev)")
    parser.add_argument("--debug", action="store_true",
                        help="debug mode: jax_debug_nans + single batch "
                             "(config/mode/debug equivalent)")
    parser.add_argument("--overfit", action="store_true",
                        help="overfit mode: train+eval on 10%% of batches "
                             "(config/mode/overfit)")
    parser.add_argument("--profile-dir", default=None,
                        help="capture a jax.profiler trace to this dir")
    parser.add_argument("--classical", default=None,
                        choices=["jpeg", "webp", "png", "identity"],
                        help="evaluate a classical codec baseline instead of "
                             "training (classical_compressors.py equivalent)")
    parser.add_argument("-m", "--multirun", action="store_true",
                        help="hydra-style multirun: comma-separated override "
                             "values expand into a cartesian sweep "
                             "(e.g. -m loss.beta=0.01,0.1,1)")
    args = parser.parse_args(argv)

    # multi-host: no-op unless JAX_COORDINATOR_ADDRESS is set; must run
    # before the backend initializes (reference: submitit/SLURM wires
    # trainer.num_nodes, config/main.yaml:123 — here the launcher exports
    # coordinator env vars and every process runs the same CLI command)
    from .core.mesh import init_distributed

    init_distributed()

    from .pipeline.config import ExperimentConfig, apply_overrides, preset
    from .pipeline.run import main as run_main

    cfg = (ExperimentConfig() if args.preset == "default"
           else preset(args.preset))
    if args.dev:
        cfg.data_feat.n_epochs = min(cfg.data_feat.n_epochs, 2)
        cfg.trainer.limit_train_batches = 0.1
        cfg.trainer.limit_eval_batches = 0.2
    if args.debug:
        cfg.data_feat.n_epochs = 1
        cfg.trainer.limit_train_batches = 0.01
        cfg.trainer.limit_eval_batches = 0.01
    if args.overfit:
        cfg.trainer.limit_train_batches = 0.1
        cfg.trainer.limit_eval_batches = 0.1

    if args.multirun:
        if args.classical:
            raise SystemExit(
                "--classical is not supported with -m/--multirun; run the "
                "classical baseline per configuration instead")
        return _multirun(cfg, args)

    cfg = apply_overrides(cfg, args.overrides)

    from .core.profiling import debug_mode, profile_trace

    if args.classical:
        from .compressors.classical import ClassicalCompressor
        from .pipeline.run import _test_dataset, instantiate_datamodule
        from .train.metrics import write_results_csv

        instantiate_datamodule(cfg, cfg.data_feat)
        ds = _test_dataset(cfg, cfg.data_feat)
        comp = ClassicalCompressor(mode=args.classical)
        bs = min(cfg.data_feat.val_batch_size, len(ds))
        # whole split, deterministic order (ragged tail kept) — the learned
        # runs' _evaluate covers the full split, so the baseline must too
        from .pipeline.run import _all_batches
        metrics = comp.evaluate(_all_batches(ds, bs, cfg.trainer.seed),
                                stage="feat")
        cfg.experiment = f"{cfg.experiment}_classical_{args.classical}"
        write_results_csv(cfg.stage_dir, "featurizer", metrics)
    else:
        with debug_mode(args.debug), profile_trace(args.profile_dir):
            metrics = run_main(cfg)
    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in metrics.items()}, indent=2))
    return metrics


def _multirun(base_cfg, args):
    """Hydra-multirun equivalent: comma lists expand to a cartesian sweep.

    The reference's experiment scripts launch RD sweeps as
    `python main.py -m featurizer.loss.beta=0.01,0.1,1 ...` (Hydra multirun,
    bin/*/*.sh). Each job runs the full pipeline; result paths are
    distinguished by the swept values (beta/seed/zdim/... are encoded in
    the long_name path scheme — a `-run{i}` experiment suffix is added only
    when a combo is NOT distinguished by its path, so the aggregator's
    path parsing keeps working).
    """
    import copy
    import itertools
    import json as _json

    from .core.profiling import debug_mode, profile_trace
    from .pipeline.config import apply_overrides
    from .pipeline.run import main as run_main

    sweeps, fixed = [], []
    for ov in args.overrides:
        key, value = ov.split("=", 1)
        if "," in value and not value.lstrip().startswith(("(", "[", "{")):
            sweeps.append((key, value.split(",")))
        else:
            fixed.append(ov)
    if not sweeps:
        sweeps = [("", [""])]  # degenerate: one job

    results = []
    seen_names = set()
    for i, combo in enumerate(itertools.product(*(v for _, v in sweeps))):
        ovs = list(fixed) + [f"{k}={v}" for (k, _), v in zip(sweeps, combo)
                             if k]
        cfg = apply_overrides(copy.deepcopy(base_cfg), ovs)
        if cfg.long_name in seen_names:
            cfg.experiment = f"{cfg.experiment}-run{i}"
        seen_names.add(cfg.long_name)
        # --debug / --profile-dir apply per job (trace dirs suffixed)
        pdir = f"{args.profile_dir}/job{i}" if args.profile_dir else None
        with debug_mode(args.debug), profile_trace(pdir):
            metrics = run_main(cfg)
        rec = {"job": i, "overrides": ovs,
               "metrics": {k: v for k, v in metrics.items()
                           if isinstance(v, (int, float))}}
        print(_json.dumps(rec))
        results.append(rec)
    return results


if __name__ == "__main__":
    main()
