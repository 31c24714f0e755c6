"""OpenAI CLIP's ModifiedResNet visual tower (flax, NHWC, TPU-native).

The reference's `PretrainedSSL(model="clip_rn50")` keeps
`clip.load("RN50").visual` (`/root/reference/lossyless/architectures.py:
356-376`, out_dim asserted 1024 at :340) — NOT a torchvision ResNet but
CLIP's modified variant:

* a 3-conv stem (3x3/s2 -> 3x3 -> 3x3, each BN+ReLU) followed by a 2x2
  average pool instead of the 7x7/s2 conv + max pool,
* anti-aliased downsampling: every strided convolution becomes a stride-1
  convolution with a 2x2 average pool at the stride point, in both the
  bottleneck body and the shortcut branch,
* a final AttentionPool2d head: spatial features flatten to tokens, a mean
  token is prepended, a learned positional embedding is added, and ONE
  multi-head attention readout (separate q/k/v/c projections, query = the
  mean token) produces the `out_dim`-d embedding.

The attention readout is exactly the 1-token-query problem the Pallas
`fused_attention_cls` kernel solves for the ViT's last block, so it is
reused here on TPU backends (einsum elsewhere).

`convert_clip_resnet` maps an OpenAI CLIP RN50 state dict (bare or
`visual.`-prefixed) onto this module's parameter/batch-stats trees;
numerical parity against a torch-side ModifiedResNet is pinned by
`tests/test_clip_resnet_parity.py`.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import BN_MOMENTUM


def _use_pallas() -> bool:
    from .flash_attn import use_pallas_backend

    return use_pallas_backend()


class ClipBottleneck(nn.Module):
    """CLIP bottleneck: stride-1 convs, avg-pool at the stride point."""

    planes: int
    stride: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        d = jnp.dtype(self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=d)
        norm = partial(nn.BatchNorm, use_running_average=not training, momentum=BN_MOMENTUM)
        out = conv(self.planes, (1, 1), name="conv1")(x)
        out = nn.relu(norm(name="bn1")(out)).astype(d)
        out = conv(self.planes, (3, 3), padding=1, name="conv2")(out)
        out = nn.relu(norm(name="bn2")(out)).astype(d)
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride,) * 2, (self.stride,) * 2)
        out = conv(self.planes * 4, (1, 1), name="conv3")(out)
        out = norm(name="bn3")(out)
        identity = x
        if self.stride > 1 or x.shape[-1] != self.planes * 4:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2,
                                       (self.stride,) * 2)
            identity = conv(self.planes * 4, (1, 1),
                            name="downsample_conv")(identity)
            identity = norm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """Mean-token attention readout over the spatial feature map."""

    heads: int
    out_dim: int
    dtype: str = "float32"
    attn_impl: str = "auto"  # auto (pallas on TPU) | pallas | einsum

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        d = jnp.dtype(self.dtype)
        B, H, W, C = x.shape
        t = x.reshape(B, H * W, C)
        t = jnp.concatenate([t.mean(axis=1, keepdims=True), t], axis=1)
        pe = self.param("positional_embedding",
                        nn.initializers.normal(C ** -0.5), (H * W + 1, C))
        t = (t + pe[None]).astype(d)
        q0 = nn.Dense(C, dtype=d, name="q_proj")(t[:, :1])
        k = nn.Dense(C, dtype=d, name="k_proj")(t)
        v = nn.Dense(C, dtype=d, name="v_proj")(t)
        kv = jnp.concatenate([k, v], axis=-1)
        impl = self.attn_impl
        if impl == "auto":
            impl = "pallas" if _use_pallas() else "einsum"
        if impl == "pallas":
            from .flash_attn import fused_attention_cls

            out = fused_attention_cls(q0, kv, self.heads)
        else:
            from .flash_attn import _reference_attention_cls

            out = _reference_attention_cls(q0, kv, self.heads)
        return nn.Dense(self.out_dim, dtype=d, name="c_proj")(out)[:, 0]


class ClipResNet(nn.Module):
    """CLIP RN50-style tower: NHWC float images -> (B, out_dim) embedding."""

    out_dim: int = 1024
    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    heads: int = 32
    dtype: str = "float32"  # "bfloat16" = MXU mixed precision
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        d = jnp.dtype(self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=d)
        norm = partial(nn.BatchNorm, use_running_average=not training, momentum=BN_MOMENTUM)
        x = x.astype(d)
        x = conv(self.width // 2, (3, 3), 2, padding=1, name="conv1")(x)
        x = nn.relu(norm(name="bn1")(x)).astype(d)
        x = conv(self.width // 2, (3, 3), padding=1, name="conv2")(x)
        x = nn.relu(norm(name="bn2")(x)).astype(d)
        x = conv(self.width, (3, 3), padding=1, name="conv3")(x)
        x = nn.relu(norm(name="bn3")(x)).astype(d)
        x = nn.avg_pool(x, (2, 2), (2, 2))
        for i, n_blocks in enumerate(self.layers):
            planes = self.width * 2 ** i
            for j in range(n_blocks):
                stride = 2 if i > 0 and j == 0 else 1
                x = ClipBottleneck(planes, stride, self.dtype,
                                   name=f"layer{i + 1}_{j}")(
                    x, training=training).astype(d)
        x = AttentionPool2d(self.heads, self.out_dim, self.dtype,
                            self.attn_impl, name="attnpool")(x)
        return x.astype(jnp.float32)


def convert_clip_resnet(torch_state_dict) -> tuple[dict, dict]:
    """OpenAI CLIP RN50 `visual.*` weights -> (params, batch_stats) trees.

    Accepts the state dict of the full CLIP model or of the visual tower
    alone. Layer count / widths are inferred from the keys, so RN50x4-style
    scaled variants convert too.
    """
    items = torch_state_dict.items()
    if any(k.startswith("visual.") for k in torch_state_dict):
        items = [(k[len("visual."):], v) for k, v in items
                 if k.startswith("visual.")]
    sd = {}
    for k, v in items:
        sd[k] = np.asarray(v.float().cpu().numpy() if hasattr(v, "cpu")
                           else v, dtype=np.float32)

    def conv(name):
        return {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0)}

    def bn(name):
        return ({"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]},
                {"mean": sd[f"{name}.running_mean"],
                 "var": sd[f"{name}.running_var"]})

    def linear(name):
        return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}

    params, stats = {}, {}
    for c in ("conv1", "conv2", "conv3"):
        params[c] = conv(c)
    for b in ("bn1", "bn2", "bn3"):
        params[b], stats[b] = bn(b)

    stage = 1
    while f"layer{stage}.0.conv1.weight" in sd:
        j = 0
        while f"layer{stage}.{j}.conv1.weight" in sd:
            t = f"layer{stage}.{j}"
            bp, bs = {}, {}
            for c in ("conv1", "conv2", "conv3"):
                bp[c] = conv(f"{t}.{c}")
            for b in ("bn1", "bn2", "bn3"):
                bp[b], bs[b] = bn(f"{t}.{b}")
            # CLIP's shortcut is Sequential(("-1", avgpool), ("0", conv),
            # ("1", bn)) — the avg pool has no parameters
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = conv(f"{t}.downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = bn(
                    f"{t}.downsample.1")
            params[f"layer{stage}_{j}"] = bp
            stats[f"layer{stage}_{j}"] = bs
            j += 1
        stage += 1

    params["attnpool"] = {
        "positional_embedding": sd["attnpool.positional_embedding"],
        "q_proj": linear("attnpool.q_proj"),
        "k_proj": linear("attnpool.k_proj"),
        "v_proj": linear("attnpool.v_proj"),
        "c_proj": linear("attnpool.c_proj"),
    }
    return params, stats
