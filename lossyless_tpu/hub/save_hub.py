"""Export a trained compressor's rate estimator to the hub format.

Equivalent of `/root/reference/utils/save_hub.py:39-52`: extract the
rate-estimator parameters (affine + entropy bottleneck) from a trained
LearnableCompressor state and save them standalone so `hub.ClipCompressor`
can load them next to (converted) CLIP weights.

Native format is `.npz` (portable, no pickle); `.pt`-compatible export via
torch is provided for interop with the reference's loader.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def extract_rate_params(params: dict) -> dict:
    """Flatten rate-estimator params to the hub naming convention."""
    rp = params["rate_estimator"]
    out = {
        "scaling": np.asarray(rp["affine"]["scaling"]),
        "biasing": np.asarray(rp["affine"]["biasing"]),
    }
    for k, v in rp["entropy_bottleneck"].items():
        out[f"entropy_bottleneck._{k}" if not k.startswith("quantiles")
            else "entropy_bottleneck.quantiles"] = np.asarray(v)
    return out


def save_hub(params: dict, out_dir: str | Path, beta: float):
    """Write `hub/beta{β:.0e}/factorized_rate.npz` (+ .pt if torch present)."""
    out = Path(out_dir) / f"beta{beta:.0e}"
    out.mkdir(parents=True, exist_ok=True)
    flat = extract_rate_params(params)
    np.savez(out / "factorized_rate.npz", **flat)
    try:
        import torch
        # np.array gives a fresh writable C-contiguous buffer in one copy:
        # torch warns on tensors over read-only numpy views (jax exports)
        torch.save({k: torch.from_numpy(np.array(v))
                    for k, v in flat.items()},
                   out / "factorized_rate.pt")
    except ImportError:
        pass
    return out


def load_hub_npz(path: str | Path):
    """Inverse of save_hub: returns (eb_params, scaling, biasing)."""
    data = np.load(path)
    eb_params, scaling, biasing = {}, None, None
    for k in data.files:
        if k == "scaling":
            scaling = data[k]
        elif k == "biasing":
            biasing = data[k]
        elif k.startswith("entropy_bottleneck."):
            name = k.split(".", 1)[1].lstrip("_")
            eb_params[name] = data[k]
    return eb_params, scaling, biasing
