"""Convert torchvision-layout ResNet weights to our flax ResNet.

Covers the reference's torchvision-layout pretrained SSL towers
(`PretrainedSSL`, architectures.py:312-379): plain supervised ResNet-50
state dicts and SimCLR/SwAV backbones (pl_bolts export the same layout).
CLIP's RN50 is NOT torchvision layout (3-conv stem, avg-pool downsampling,
attention-pool head) — that one converts via `nn.clip_resnet`.

Returns (params, batch_stats) flax collections for `nn.resnet.ResNet`.
The classification head (`fc.*`) is skipped unless `include_head=True` and
the output dims match (SSL use discards it anyway).
"""

from __future__ import annotations

import numpy as np

STAGE_SIZES = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
               "resnet50": (3, 4, 6, 3)}
BOTTLENECK = {"resnet18": False, "resnet34": False, "resnet50": True}


def convert_torchvision_resnet(state_dict, base: str = "resnet50",
                               include_head: bool = False):
    sd = {k: np.asarray(v.cpu().numpy() if hasattr(v, "cpu") else v,
                        np.float32)
          for k, v in state_dict.items()}

    def conv(name):
        return {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0)}

    def bn(name):
        p = {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}
        s = {"mean": sd[f"{name}.running_mean"],
             "var": sd[f"{name}.running_var"]}
        return p, s

    params, stats = {}, {}
    params["Conv_0"] = conv("conv1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = bn("bn1")

    bottleneck = BOTTLENECK[base]
    n_convs = 3 if bottleneck else 2
    block_cls = "BottleneckBlock" if bottleneck else "BasicBlock"
    block_idx = 0
    for stage, n_blocks in enumerate(STAGE_SIZES[base], start=1):
        for j in range(n_blocks):
            tv = f"layer{stage}.{j}"
            bp, bs = {}, {}
            for c in range(n_convs):
                bp[f"Conv_{c}"] = conv(f"{tv}.conv{c + 1}")
                bp[f"BatchNorm_{c}"], bs[f"BatchNorm_{c}"] = bn(
                    f"{tv}.bn{c + 1}")
            if f"{tv}.downsample.0.weight" in sd:
                bp[f"Conv_{n_convs}"] = conv(f"{tv}.downsample.0")
                bp[f"BatchNorm_{n_convs}"], bs[f"BatchNorm_{n_convs}"] = bn(
                    f"{tv}.downsample.1")
            key = f"{block_cls}_{block_idx}"
            params[key], stats[key] = bp, bs
            block_idx += 1

    if include_head and "fc.weight" in sd:
        params["Dense_0"] = {"kernel": sd["fc.weight"].T,
                             "bias": sd["fc.bias"]}
    return params, stats


def load_into(variables: dict, converted_params: dict,
              converted_stats: dict) -> dict:
    """Merge converted weights into freshly-initialized flax variables
    (keeps the randomly-initialized head when the converter skipped it)."""
    params = dict(variables["params"])
    for k, v in converted_params.items():
        params[k] = v
    batch_stats = dict(variables.get("batch_stats", {}))
    for k, v in converted_stats.items():
        batch_stats[k] = v
    return {"params": params, "batch_stats": batch_stats}
