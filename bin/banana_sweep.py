"""Banana RD sweep with the reference training recipe (TPU, fused epochs).

Reproduces the reference's banana_viz_VIC/VAE points
(/root/reference/results/exp_banana_viz_VIC/summarized_metrics_merged.csv:
VIC rate 2.30 bits @ distortion 0.051, VAE 4.83 @ 0.109) and sweeps extra
betas for the RD curve. One process runs all configs sequentially (the axon
tunnel allows a single TPU client; beta/seed ride as runtime values so the
fused-epoch XLA program compiles once).

Usage: python bin/banana_sweep.py [--quick]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lossyless_tpu.cli import main as cli_main  # noqa: E402

RUNS = [
    ("banana_viz_VIC", 0.02, 123),
    ("banana_viz_VIC", 0.07, 123),
    ("banana_viz_VIC", 0.2, 123),
    ("banana_viz_VAE", 0.07, 123),
    ("banana_viz_VAE", 0.07, 124),
]


def publish(src="results", dst="artifacts/banana"):
    """Copy the sweep's summary CSVs + plots into the tracked artifacts dir
    (results/ is gitignored as a live scratch area)."""
    import shutil

    src, dst = Path(src), Path(dst)
    dst.mkdir(parents=True, exist_ok=True)
    for pat in ("summarized_metrics_merged.csv", "rd_curves.png",
                "summarized_RD_curves_merged.csv", "invariance_RD_curve.png",
                "exp_banana_viz_VIC/codebook.png",
                "exp_banana_viz_VIC/maxinv.png",
                "exp_banana_viz_VIC/traversals_1d.png",
                "exp_banana_viz_VIC/traversals_2d.png"):
        for f in src.glob(pat):
            shutil.copy2(f, dst / f.name)
            print(f"published {f} -> {dst / f.name}", flush=True)


def run_all(extra=()):
    for preset_name, beta, seed in RUNS:
        t0 = time.time()
        print(f"=== {preset_name} beta={beta} seed={seed}", flush=True)
        cli_main([preset_name, f"loss.beta={beta}", f"trainer.seed={seed}",
                  *extra])
        print(f"=== done in {time.time() - t0:.0f}s", flush=True)

    from lossyless_tpu.analysis.aggregate import ResultAggregator

    agg = ResultAggregator("results")
    agg.summarize()
    agg.rd_curves(hue="exp")  # VIC and VAE are separate curves
    agg.summarize_rd_curves(compare_cols=("exp",))
    agg.invariance_rd_curve(col_dist_param="exp",
                            noninvariant="banana_viz_VAE")
    print(agg.df[["exp", "beta", "seed", "test/feat/rate",
                  "test/feat/distortion", "test/feat/online_loss"]]
          .to_string(), flush=True)


def make_viz():
    """Regenerate the banana visualization artifacts (codebook plot, max-
    invariant distribution) from the trained beta=0.07 VIC weights
    (reference load_pretrained.mode=[codebook_plot,maxinv_distribution_plot])."""
    from lossyless_tpu.analysis.pretrained import PretrainedAnalyser
    from lossyless_tpu.pipeline.config import apply_overrides, preset

    cfg = apply_overrides(preset("banana_viz_VIC"),
                          ["loss.beta=0.07", "trainer.seed=123"])
    an = PretrainedAnalyser(cfg)
    out = Path("results/exp_banana_viz_VIC")
    print(an.codebook_plot(out / "codebook.png"))
    print(an.maxinv_distribution_plot(out / "maxinv.png"))
    # 1d/2d latent traversals (LatentDimInterpolator parity); banana's
    # point decoder renders sweep paths / grid deformation in source space
    print(an.latent_traversal_plot(out, range_start=-3, range_end=3))


if __name__ == "__main__":
    if "--viz-only" in sys.argv:
        make_viz()
        publish()
        sys.exit(0)
    extra = ["data_feat.n_epochs=2"] if "--quick" in sys.argv else []
    run_all(extra)
    make_viz()
    publish()
