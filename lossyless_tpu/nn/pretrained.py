"""Load pretrained tower weights into the training pipeline.

The reference's `PretrainedSSL` downloads and loads real CLIP / SimCLR /
SwAV weights at model construction
(`/root/reference/lossyless/architectures.py:356-376`), so presets like
`bottleneck_clip_lossyZ` train a bottleneck on top of a *frozen pretrained*
encoder. The TPU pipeline keeps model construction pure (random init) and
injects converted weights into the train state instead: set
`encoder.pretrained_path` and the featurizer stage overwrites
`params["p_ZlX"]["mapper"]` (plus the matching `batch_stats` subtree for
BN towers) before the first step — compose with `frozen=("p_ZlX",)` for the
reference's frozen-tower semantics (Freezer, callbacks.py:503-531).

Accepted formats:

* a torch ``.pt``/``.pth`` state dict — dispatched by ``encoder.arch``
  through the existing converters (`nn.vit.convert_openai_clip_weights`
  for CLIP ViT; `nn.convert_resnet.convert_torchvision_resnet` for the
  ResNet-50 SSL towers, with common SSL checkpoint prefixes stripped),
* a ``.npz`` of already-converted flax arrays with ``/``-joined keys
  (optionally split into ``params/...`` and ``batch_stats/...`` prefixes
  for BN towers; bare keys are treated as params),
* an orbax directory exported by `train.checkpoints.save_weights`
  (restored against the initialized mapper subtree; the combined
  {params, batch_stats} layout restores both collections).

A tower with BatchNorm statistics loaded from a format that carries none
warns instead of silently evaluating with init statistics.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

# prefixes seen on public SSL ResNet-50 checkpoints (pl_bolts SimCLR/SwAV,
# torchvision supervised); tried longest-first until layer keys resolve
_SSL_PREFIXES = ("module.encoder.", "encoder.", "module.", "model.",
                 "backbone.", "")


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _strip_ssl_prefix(sd: dict) -> dict:
    for pref in _SSL_PREFIXES:
        if any(k.startswith(pref + "conv1.") for k in sd):
            return {k[len(pref):]: v for k, v in sd.items()
                    if k.startswith(pref)}
    return sd


def _load_torch_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    # checkpoints often nest the weights under a well-known key
    for key in ("state_dict", "model_state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state dict, got {type(obj)}")
    return obj


def _convert_for_arch(arch: str, sd: dict, base: str = "resnet50"):
    """torch state dict -> (mapper_params, mapper_batch_stats|None)."""
    if arch in ("clip", "clip_vit"):
        from .vit import convert_openai_clip_weights

        return convert_openai_clip_weights(sd), None
    if arch == "clip_rn50":
        # OpenAI CLIP RN50 = ModifiedResNet (visual.-prefix handled inside)
        from .clip_resnet import convert_clip_resnet

        return convert_clip_resnet(sd)
    if arch in ("simclr", "swav", "resnet"):
        from .convert_resnet import convert_torchvision_resnet

        sd = _strip_ssl_prefix({k: v for k, v in sd.items()})
        params, stats = convert_torchvision_resnet(sd, base=base)
        return params, stats
    raise ValueError(
        f"no pretrained-weight converter for encoder.arch={arch!r} "
        f"(supported: clip/clip_vit, clip_rn50/simclr/swav/resnet)")


def _adapt_positional_embeddings(init_tree: dict, loaded_tree: dict) -> dict:
    """Bicubically resample token-grid positional embeddings on mismatch.

    The converted CLIP towers carry a learned positional embedding over
    [cls/mean token] + a square spatial grid (ViT patches at
    image_size/patch; the RN50 attention pool at image_size/32).
    Checkpoints are published at 224px; training at another resolution
    (e.g. 96px STL10 in the ssl presets) changes the grid size, so the
    spatial part is resampled bicubically — the standard fine-tuning
    practice — while the lead token embedding is kept as-is. Applies only
    when both sizes are 1 + g*g for integer g; anything else falls through
    to the shape check's explicit error.
    """
    import math

    init_flat = _flatten(jax.tree.map(np.asarray, init_tree))
    out = _flatten(loaded_tree)
    changed = False
    for k, v in list(out.items()):
        if not k.endswith("positional_embedding") or k not in init_flat:
            continue
        want = init_flat[k].shape
        if (tuple(want) == tuple(v.shape) or v.ndim != 2 or len(want) != 2
                or want[1] != v.shape[1]):
            continue
        g_src = math.isqrt(v.shape[0] - 1)
        g_dst = math.isqrt(int(want[0]) - 1)
        if g_src * g_src + 1 != v.shape[0] or g_dst * g_dst + 1 != want[0]:
            continue
        import jax.numpy as jnp

        grid = jnp.asarray(v[1:].reshape(g_src, g_src, v.shape[1]),
                           jnp.float32)
        grid = jax.image.resize(grid, (g_dst, g_dst, v.shape[1]), "cubic")
        out[k] = np.concatenate(
            [v[:1], np.asarray(grid).reshape(g_dst * g_dst, v.shape[1])],
            axis=0).astype(v.dtype)
        changed = True
    return _unflatten(out) if changed else loaded_tree


def _check_shapes(init_tree: dict, loaded_tree: dict, where: str):
    """Every loaded leaf must match an initialized leaf's shape.

    Loaded trees may be partial (e.g. converter skips the classifier head);
    initialized leaves without a loaded counterpart keep their random init.
    """
    init_flat = _flatten(jax.tree.map(np.asarray, init_tree))
    loaded_flat = _flatten(loaded_tree)
    problems = []
    for k, v in loaded_flat.items():
        if k not in init_flat:
            problems.append(f"unexpected key {k!r}")
        elif tuple(init_flat[k].shape) != tuple(v.shape):
            problems.append(
                f"{k}: checkpoint shape {tuple(v.shape)} vs model "
                f"{tuple(init_flat[k].shape)}")
    if problems:
        raise ValueError(
            f"pretrained weights do not fit the {where} tree "
            f"(is encoder.arch/z_dim/arch_kwargs consistent with the "
            f"checkpoint?):\n  " + "\n  ".join(problems[:12]))


def _merge(init_tree: dict, loaded_tree: dict) -> dict:
    out = dict(init_tree)
    for k, v in loaded_tree.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def load_pretrained_encoder(encoder_cfg, params: dict, batch_stats: dict,
                            path: str | None = None):
    """Return (params, batch_stats) with the encoder tower overwritten.

    `params` / `batch_stats` are the full train-state collections from
    `TrainState.create`; only the `p_ZlX/mapper` subtree is touched.
    """
    path = path or encoder_cfg.pretrained_path
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(
            f"encoder.pretrained_path={path!r} does not exist")

    params = jax.tree.map(lambda x: x, params)  # shallow-copy containers
    init_mapper = params["p_ZlX"]["mapper"]
    init_stats = (batch_stats or {}).get("p_ZlX", {}).get("mapper", {})

    loaded_stats = None
    if p.is_dir():
        from ..train.checkpoints import load_state_weights

        stats_arg = jax.device_get(init_stats) if init_stats else None
        mapper, loaded_stats = load_state_weights(
            p, jax.device_get(init_mapper), stats_arg)
        if loaded_stats is stats_arg or not loaded_stats:
            loaded_stats = None  # legacy export: nothing actually loaded
    elif p.suffix == ".npz":
        flat = dict(np.load(p))
        stats_flat = {k[len("batch_stats/"):]: v for k, v in flat.items()
                      if k.startswith("batch_stats/")}
        param_flat = {
            (k[len("params/"):] if k.startswith("params/") else k): v
            for k, v in flat.items() if not k.startswith("batch_stats/")}
        mapper = _unflatten(param_flat)
        loaded_stats = _unflatten(stats_flat) if stats_flat else None
    elif p.suffix in (".pt", ".pth", ".bin"):
        sd = _load_torch_state_dict(str(p))
        base = encoder_cfg.arch_kwargs.get("base", "resnet50")
        mapper, loaded_stats = _convert_for_arch(encoder_cfg.arch, sd,
                                                 base=base)
    else:
        raise ValueError(
            f"unrecognized pretrained checkpoint format: {p.suffix!r} "
            f"(expected .pt/.pth/.bin torch, .npz flax, or an orbax dir)")

    mapper = _adapt_positional_embeddings(init_mapper, mapper)
    _check_shapes(init_mapper, mapper, "encoder (params/p_ZlX/mapper)")
    new_params = dict(params)
    new_params["p_ZlX"] = dict(params["p_ZlX"])
    new_params["p_ZlX"]["mapper"] = _merge(init_mapper, mapper)

    new_stats = batch_stats
    if init_stats and not loaded_stats:
        import warnings

        warnings.warn(
            f"{path}: the encoder has BatchNorm statistics but the "
            "checkpoint provides none — running statistics stay at init "
            "values (export with batch_stats, or use a torch .pt with BN "
            "buffers)")
    if loaded_stats:
        _check_shapes(init_stats, loaded_stats,
                      "encoder (batch_stats/p_ZlX/mapper)")
        new_stats = dict(batch_stats or {})
        new_stats["p_ZlX"] = dict(new_stats.get("p_ZlX", {}))
        new_stats["p_ZlX"]["mapper"] = _merge(init_stats, loaded_stats)
    return new_params, new_stats
