"""Load the reference's published rate-estimator checkpoints into JAX.

The reference ships rate-estimator-only state dicts at
`/root/reference/hub/beta{1e-02,5e-02,1e-01}/factorized_rate.pt`
(exported by `utils/save_hub.py:39-52`, consumed by `hub/compressor.py:53-63`).
Keys: `scaling`, `biasing`, `entropy_bottleneck._matrix{k}/_bias{k}/_factor{k}`,
`entropy_bottleneck.quantiles` (CDF buffers are empty and rebuilt on load).

This module maps them onto our entropy-bottleneck parameter pytree so the TPU
compressor reproduces the published ~1506 bits/img rates without retraining.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

REFERENCE_HUB = Path("/root/reference/hub")
BETA_DIRS = {"b001": "beta1e-02", "b005": "beta5e-02", "b01": "beta1e-01"}


def load_factorized_rate(path_or_beta="b005"):
    """Return (eb_params, scaling, biasing) as numpy arrays.

    ``eb_params`` matches `lossyless_tpu.coding.entropy_bottleneck` layout.
    """
    import torch  # host-side only; never in the TPU compute path

    path = Path(path_or_beta)
    if not path.exists():
        path = REFERENCE_HUB / BETA_DIRS[str(path_or_beta)] / "factorized_rate.pt"
    sd = torch.load(path, map_location="cpu")

    def np_(k):
        return sd[k].detach().numpy().astype(np.float32)

    eb_params = {}
    i = 0
    while f"entropy_bottleneck._matrix{i}" in sd:
        eb_params[f"matrix{i}"] = np_(f"entropy_bottleneck._matrix{i}")
        eb_params[f"bias{i}"] = np_(f"entropy_bottleneck._bias{i}")
        if f"entropy_bottleneck._factor{i}" in sd:
            eb_params[f"factor{i}"] = np_(f"entropy_bottleneck._factor{i}")
        i += 1
    eb_params["quantiles"] = np_("entropy_bottleneck.quantiles")

    scaling = np_("scaling")
    biasing = np_("biasing")
    return eb_params, scaling, biasing
