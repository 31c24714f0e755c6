"""Reload trained experiments for offline analysis/plotting.

Equivalent of `/root/reference/utils/load_pretrained.py` (PretrainedAnalyser):
rebuild the model from a pipeline config, load the exported best-featurizer
weights, and expose encode/decode closures for the visualization suite
(codebook plots, traversals, reconstructions) without re-running training.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


class PretrainedAnalyser:
    def __init__(self, cfg, ckpt_dir: str | Path | None = None):
        from ..compressors.compressor import LearnableCompressor
        from ..pipeline.run import instantiate_datamodule
        from ..train.checkpoints import load_state_weights
        from ..train.state import OptimConfig, TrainState

        self.cfg = cfg
        self.dataset = instantiate_datamodule(cfg, cfg.data_feat)
        self.model = LearnableCompressor(cfg.compressor_config())

        sample = next(self.dataset.batches(
            min(cfg.data_feat.batch_size, len(self.dataset)),
            seed=cfg.trainer.seed))
        state = TrainState.create(self.model, sample,
                                  jax.random.key(cfg.trainer.seed),
                                  main=OptimConfig())
        ckpt_dir = Path(ckpt_dir or cfg.ckpt_dir)
        params, bstats = load_state_weights(
            ckpt_dir / cfg.long_name / "best_featurizer",
            jax.device_get(state.params),
            jax.device_get(state.batch_stats) if state.batch_stats else None)
        self.state = state.replace(
            params=params,
            batch_stats=bstats if bstats is not None else state.batch_stats)
        self.variables = {"params": self.state.params}
        if self.state.batch_stats:
            self.variables["batch_stats"] = self.state.batch_stats

        self.featurize = jax.jit(
            lambda x: self.model.apply(self.variables, x, method="features"))
        self.reconstruct = jax.jit(
            lambda x: self.model.apply(self.variables, x,
                                       method="reconstruct"))

    def decode(self, z_hat):
        """Decode latents through the direct-distortion decoder."""
        def fn(m, z):
            return m.distortion_estimator.reconstruct(z)
        return np.asarray(self.model.apply(self.variables,
                                           np.asarray(z_hat), method=fn))

    # -- plotting entry points (load_pretrained.py:171-373 modes) ----------

    def codebook_plot(self, out_path, xlim=(-5, 5), ylim=(-5, 5), **kwargs):
        from .visualize import codebook_plot

        return codebook_plot(
            lambda pts: np.asarray(self.featurize(pts)),
            lambda z: self.decode(z),
            out_path, xlim=xlim, ylim=ylim, **kwargs)

    def maxinv_distribution_plot(self, out_path, n_samples: int = 20000):
        from .visualize import maxinv_distribution_plot

        ds = self.dataset
        samples = ds.data[:n_samples]
        return maxinv_distribution_plot(samples, ds.max_invariant, out_path)

    def reconstruction_plot(self, out_path, n: int = 8):
        from .visualize import plot_reconstructions

        x, _, _ = next(self.dataset.batches(n, seed=0))
        x_hat = np.asarray(self.reconstruct(x))
        return plot_reconstructions(np.asarray(x), x_hat, out_path, n=n)

    def latent_traversal_plot(self, out_dir, range_start: float = -5.0,
                              range_end: float = 5.0, n_per_lat: int = 7,
                              n_lat_traverse: int = 5):
        """1d + 2d latent traversals through the trained decoder
        (LatentDimInterpolator, callbacks.py:119-231). Writes
        traversals_1d.png and traversals_2d.png under `out_dir`."""
        from .visualize import latent_traversal_1d, latent_traversal_2d

        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        z_dim = self.cfg.encoder.z_dim
        p1 = latent_traversal_1d(
            self.decode, z_dim, out_dir / "traversals_1d.png",
            range_start=range_start, range_end=range_end,
            n_per_lat=n_per_lat, n_lat_traverse=n_lat_traverse)
        p2 = None
        if z_dim >= 2:
            p2 = latent_traversal_2d(
                self.decode, z_dim, out_dir / "traversals_2d.png",
                range_start=range_start, range_end=range_end,
                n_per_lat=n_per_lat)
        return p1, p2
