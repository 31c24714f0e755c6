"""Classical codecs, aggregation, linear eval, visualization smoke tests."""

import numpy as np
import pytest

from lossyless_tpu.compressors.classical import ClassicalCompressor
from lossyless_tpu.analysis.aggregate import (collect_data, is_pareto_optimal,
                                              merge_tables, path_to_params,
                                              summarize_metrics)
from lossyless_tpu.analysis.linear_eval import z_linear_eval


@pytest.mark.parametrize("mode", ["jpeg", "webp", "png", "identity"])
def test_classical_codecs(mode):
    # smooth gradient images (noise is degenerate for transform codecs)
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    base = ((yy + xx) * 255 / 62).astype(np.uint8)
    x = np.stack([np.stack([np.roll(base, i), base, base.T], -1)
                  for i in range(4)])
    comp = ClassicalCompressor(mode=mode)
    x_hat, logs = comp.batch_run(x)
    assert x_hat.shape == x.shape
    assert logs["n_bits"] > 0
    if mode in ("png", "identity"):  # lossless
        np.testing.assert_array_equal(x_hat, x)
        assert logs["mse"] == 0
        assert logs["ms_ssim"] == pytest.approx(1.0)
    else:
        assert logs["psnr"] > 20
        assert 0.5 < logs["ms_ssim"] <= 1.0


def test_ms_ssim_analytic_pin():
    """Pin against the closed form: constant images differing by a shift.

    All variances/covariances vanish, so every contrast-structure term is
    exactly 1 and MS-SSIM reduces to the luminance term at the last scale,
    l = (2*m1*m2 + C1)/(m1^2 + m2^2 + C1), raised to the last weight.
    """
    from lossyless_tpu.compressors.classical import _MSSSIM_WEIGHTS, ms_ssim

    x = np.full((1, 224, 224, 3), 0.5)
    y = np.full((1, 224, 224, 3), 0.6)
    c1 = 0.01 ** 2
    lum = (2 * 0.5 * 0.6 + c1) / (0.5 ** 2 + 0.6 ** 2 + c1)
    expected = lum ** _MSSSIM_WEIGHTS[-1]
    assert ms_ssim(x, y) == pytest.approx(expected, rel=1e-9)
    assert ms_ssim(x, x) == pytest.approx(1.0)


def test_ms_ssim_orders_jpeg_quality():
    """Higher JPEG quality must score a higher MS-SSIM (and small 32px
    images exercise the reduced-scale path: only 1 scale fits 11-tap
    windows below 88px)."""
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.arange(96), np.arange(96), indexing="ij")
    base = ((yy * xx) % 251).astype(np.uint8)
    x = np.stack([np.stack([base, base.T, np.roll(base, 7)], -1)] * 2)
    scores = {}
    for q in (10, 95):
        _, logs = ClassicalCompressor(mode="jpeg", quality=q).batch_run(x)
        scores[q] = logs["ms_ssim"]
    assert 0.0 < scores[10] < scores[95] <= 1.0

    from lossyless_tpu.compressors.classical import ms_ssim

    small = x[:, :32, :32].astype(np.float64) / 255.0
    noisy = np.clip(small + rng.normal(0, 0.05, small.shape), 0, 1)
    v = ms_ssim(small, noisy)
    assert 0.0 < v < 1.0

    # images below the 11-tap window: the window shrinks (odd) instead of
    # crashing — batch_run must keep returning metrics for e.g. 8x8 inputs
    tiny = x[:, :8, :8].astype(np.float64) / 255.0
    assert ms_ssim(tiny, tiny) == pytest.approx(1.0)
    tiny_noisy = np.clip(tiny + rng.normal(0, 0.05, tiny.shape), 0, 1)
    assert 0.0 < ms_ssim(tiny, tiny_noisy) < 1.0
    _, logs8 = ClassicalCompressor(mode="png").batch_run(
        x[:, :8, :8].copy())
    assert logs8["ms_ssim"] == pytest.approx(1.0)  # png is lossless


def test_aggregator_roundtrip(tmp_path):
    from lossyless_tpu.train.metrics import write_results_csv

    for seed in (1, 2):
        d = (tmp_path / "exp_demo" / "datafeat_banana" / "dist_VIC"
             / f"beta_1.0e-01" / f"seed_{seed}")
        write_results_csv(d, "featurizer",
                          {"test/feat/rate": 5.0 + seed,
                           "test/feat/distortion": 0.1})
        write_results_csv(d, "predictor", {"test/pred/err": 0.02 * seed})

    df = collect_data(tmp_path)
    assert len(df) == 4
    assert set(df["stage"]) == {"featurizer", "predictor"}
    assert (df["datafeat"] == "banana").all()

    merged = merge_tables(df)
    assert len(merged) == 2
    assert "test/feat/rate" in merged and "test/pred/err" in merged

    summary = summarize_metrics(merged, group_by=["datafeat", "dist"])
    assert summary["test/feat/rate_mean"].iloc[0] == pytest.approx(6.5)


def test_pareto():
    pts = np.array([[1, 5], [2, 3], [3, 4], [4, 1], [5, 2]])
    mask = is_pareto_optimal(pts)
    np.testing.assert_array_equal(mask, [True, True, False, True, False])


def test_linear_eval_separable():
    rng = np.random.default_rng(0)
    n = 400
    y = rng.integers(0, 2, n)
    z = rng.normal(0, 0.3, (n, 8)) + y[:, None] * 2.0
    res = z_linear_eval(z[:300], y[:300], z[300:], y[300:], fixed_C=0.01)
    assert res["acc"] > 0.95


def test_visualizations(tmp_path):
    from lossyless_tpu.analysis.visualize import (codebook_plot,
                                                  maxinv_distribution_plot,
                                                  plot_reconstructions)
    from lossyless_tpu.data.banana import BananaDataset

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (8, 16, 16, 1))
    p = plot_reconstructions(x, x + 0.01, tmp_path / "rec.png")
    assert p.exists() if hasattr(p, "exists") else True

    # quantizer that rounds to a 1-unit grid; decode = identity
    out = codebook_plot(lambda pts: np.round(pts), lambda z: z,
                        tmp_path / "codebook.png", n_grid=60)
    assert (tmp_path / "codebook.png").exists()

    ds = BananaDataset(length=2048)
    maxinv_distribution_plot(ds.data, ds.max_invariant,
                             tmp_path / "maxinv.png")
    assert (tmp_path / "maxinv.png").exists()


def test_latent_traversals(tmp_path):
    """1d/2d traversal plots (LatentDimInterpolator, callbacks.py:119-231)
    for both decoder kinds, with traversal semantics checked via the
    latents the decoder actually receives."""
    from lossyless_tpu.analysis.visualize import (latent_traversal_1d,
                                                  latent_traversal_2d)

    seen = []

    def img_decode(zs):
        seen.append(np.asarray(zs))
        return np.clip(zs[:, :1, None, None] * np.ones((1, 8, 8, 1)), 0, 1)

    z_dim = 6
    latent_traversal_1d(img_decode, z_dim, tmp_path / "t1.png",
                        range_start=-5, range_end=5, n_per_lat=7,
                        n_lat_traverse=3)
    assert (tmp_path / "t1.png").exists()
    zs = seen[0]
    assert zs.shape == (3 * 7, z_dim)
    # row r sweeps latent r from -5 to 5 while others stay at the 0 base
    sweeps = np.linspace(-5, 5, 7)
    for r in range(3):
        block = zs[r * 7:(r + 1) * 7]
        np.testing.assert_allclose(block[:, r], sweeps)
        others = np.delete(block, r, axis=1)
        np.testing.assert_array_equal(others, 0)

    seen.clear()
    latent_traversal_2d(img_decode, z_dim, tmp_path / "t2.png", n_per_lat=5)
    assert (tmp_path / "t2.png").exists()
    zs = seen[0]
    assert zs.shape == (25, z_dim)
    assert set(np.unique(zs[:, 0])) == set(np.linspace(-5, 5, 5))
    np.testing.assert_array_equal(zs[:, 2:], 0)

    # point decoder (banana): z -> 2d source coordinates
    def pt_decode(zs):
        return np.stack([zs[:, 0], np.sin(zs[:, 1])], -1)

    latent_traversal_1d(pt_decode, 2, tmp_path / "p1.png")
    latent_traversal_2d(pt_decode, 2, tmp_path / "p2.png")
    assert (tmp_path / "p1.png").exists() and (tmp_path / "p2.png").exists()

    with pytest.raises(ValueError):
        latent_traversal_2d(pt_decode, 1, tmp_path / "bad.png")


def test_classical_webp_grayscale():
    """WebP has no grayscale mode; decode must convert back (1-channel)."""
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    x = (((yy + xx) * 255 / 62).astype(np.uint8))[None, :, :, None]
    comp = ClassicalCompressor(mode="webp")
    x_hat, logs = comp.batch_run(np.repeat(x, 2, axis=0))
    assert x_hat.shape == (2, 32, 32, 1)
    assert logs["psnr"] > 25


def test_aggregate_shell_entry(tmp_path, capsys):
    """python -m lossyless_tpu.analysis.aggregate — the reference's bash
    post-hoc aggregation call, as a module entry point."""
    from lossyless_tpu.analysis.aggregate import main
    from lossyless_tpu.train.metrics import write_results_csv

    for seed in (1, 2):
        for beta in ("1.0e-01", "3.0e-01"):
            d = (tmp_path / "exp_demo" / "datafeat_banana" / "dist_VIC"
                 / f"beta_{beta}" / f"seed_{seed}")
            write_results_csv(d, "featurizer",
                              {"test/feat/rate": 5.0 + seed + float(beta),
                               "test/feat/distortion": 0.1 / float(beta),
                               "test/feat/online_loss": 0.2})
            write_results_csv(d, "communication",
                              {"test/comm/n_bits": 64.0})
            write_results_csv(d, "predictor",
                              {"test/pred/err": 0.02 * seed})

    rc = main([str(tmp_path), "--mode", "all"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[summarize]" in out
    assert (tmp_path / "summarized_metrics_merged.csv").exists()
    assert (tmp_path / "rd_curves.png").exists()
    assert (tmp_path / "pareto.png").exists()


def test_kwargs_log_scale():
    from lossyless_tpu.analysis.aggregate import kwargs_log_scale

    # pure geometric positives -> log with the inferred base
    kw = kwargs_log_scale([0.01, 0.1, 1.0])
    assert kw == {"value": "log", "base": 10}
    # zero present (beta sweeps start at 0) -> symlog, linear region sized
    # by the smallest nonzero magnitude
    kw = kwargs_log_scale([0.0, 0.01, 0.1, 1.0])
    assert kw["value"] == "symlog"
    assert kw["linthresh"] == 0.01
    # equally spaced -> linear regardless of requested base
    assert kwargs_log_scale([1, 2, 3, 4], base=10) == {"value": "linear"}
    # degenerate base -> linear
    assert kwargs_log_scale([1.0, 1.1, 1.21]) == {"value": "linear"}


def test_plot_dataset_samples(tmp_path):
    from lossyless_tpu.analysis.visualize import plot_dataset_samples
    from lossyless_tpu.data.images import ImageDataset

    # array input
    rng = np.random.default_rng(0)
    arr = rng.uniform(0, 1, (10, 8, 8, 3)).astype(np.float32)
    out = plot_dataset_samples(arr, tmp_path / "grid.png", n=4)
    assert out.exists()
    # dataset input through the batches() contract
    ds = ImageDataset("mnist", split="train", synthetic=True)
    out2 = plot_dataset_samples(ds, tmp_path / "grid_ds.png", n=4)
    assert out2.exists()


def test_scatter_lines_symlog_axis(tmp_path):
    import pandas as pd

    from lossyless_tpu.analysis.aggregate import plot_scatter_lines

    df = pd.DataFrame({"beta": [0.0, 0.01, 0.1, 1.0],
                       "acc": [0.9, 0.8, 0.7, 0.6]})
    out = plot_scatter_lines(df, tmp_path / "s.png", x="beta", y="acc",
                             logbase_x="auto")
    assert out.exists()


def test_plot_dataset_samples_smaller_than_n(tmp_path):
    """A dataset with fewer samples than n plots what it has (the batch
    iterator drops ragged tails, so n must be capped at len(dataset))."""
    from lossyless_tpu.analysis.visualize import plot_dataset_samples
    from lossyless_tpu.data.images import ImageDataset

    ImageDataset._carve_fractions.clear()  # deliberate re-split (CLAUDE.md)
    ds = ImageDataset("mnist", split="train", synthetic=True, synthetic_n=8,
                      val_fraction=0.25)  # 6 train samples after the carve
    ImageDataset._carve_fractions.clear()
    out = plot_dataset_samples(ds, tmp_path / "small.png", n=16)
    assert out.exists()
