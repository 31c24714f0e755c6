"""Batched, device-side equivalence augmentations.

The reference augments per-sample with PIL on dataloader workers
(`/root/reference/utils/data/images.py:262-329`). TPU-first redesign: each
augmentation is a jit/vmap-able function over an image *batch* with an
explicit PRNG key — augmentation runs fused on device as part of the input
pipeline, feeding the MXU without a host bottleneck.

Supported equivalences (same names as the reference's augmentation dict):
rotation, x_translation, y_translation, shear, scale, hflip, vflip, D4_group,
color, gray, resize_crop, erasing (+ "--" weak variants).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _affine_warp(img, matrix, offset):
    """Apply inverse-affine sampling to one (H,W,C) image, bilinear."""
    h, w, c = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # centered coordinates
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = yy - cy, xx - cx
    src_y = matrix[0, 0] * ys + matrix[0, 1] * xs + offset[0] + cy
    src_x = matrix[1, 0] * ys + matrix[1, 1] * xs + offset[1] + cx
    coords = jnp.stack([src_y.ravel(), src_x.ravel()])

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, coords, order=1, mode="constant", cval=0.0).reshape(h, w)

    return jnp.stack([sample_channel(img[..., i]) for i in range(c)], axis=-1)


def _rand_affine(key, batch, *, degrees=0.0, translate=(0.0, 0.0),
                 scale=(1.0, 1.0), shear=0.0):
    """Random per-sample affine (rotation/translation/scale/shear)."""
    b, h, w, _ = batch.shape
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    ang = jnp.deg2rad(jax.random.uniform(k1, (b,), minval=-degrees,
                                         maxval=degrees))
    tx = jax.random.uniform(k2, (b,), minval=-translate[0],
                            maxval=translate[0]) * w
    ty = jax.random.uniform(k3, (b,), minval=-translate[1],
                            maxval=translate[1]) * h
    sc = jax.random.uniform(k4, (b,), minval=scale[0], maxval=scale[1])
    sh = jnp.deg2rad(jax.random.uniform(k5, (b,), minval=-shear, maxval=shear))

    cos, sin = jnp.cos(ang), jnp.sin(ang)
    tan = jnp.tan(sh)
    # inverse transform (output -> input coords): inv(R S Shear) / scale
    m00 = cos / sc
    m01 = (sin + cos * tan) / sc
    m10 = -sin / sc
    m11 = (cos - sin * tan) / sc
    mats = jnp.stack([jnp.stack([m00, m01], -1),
                      jnp.stack([m10, m11], -1)], 1)  # (b,2,2)
    offs = jnp.stack([-ty, -tx], -1)  # (b,2) in (y,x)

    return jax.vmap(_affine_warp)(batch, mats, offs)


def random_rotation(key, batch, degrees=45.0):
    return _rand_affine(key, batch, degrees=degrees)


def random_translation(key, batch, axis: int, frac=0.25):
    t = (frac, 0.0) if axis == 0 else (0.0, frac)
    return _rand_affine(key, batch, translate=t)


def random_scale(key, batch, scale=(0.6, 1.4)):
    return _rand_affine(key, batch, scale=scale)


def random_shear(key, batch, shear=25.0):
    return _rand_affine(key, batch, shear=shear)


def random_hflip(key, batch, p=0.5):
    flip = jax.random.bernoulli(key, p, (batch.shape[0], 1, 1, 1))
    return jnp.where(flip, batch[:, :, ::-1, :], batch)


def random_vflip(key, batch, p=0.5):
    flip = jax.random.bernoulli(key, p, (batch.shape[0], 1, 1, 1))
    return jnp.where(flip, batch[:, ::-1, :, :], batch)


def d4_group(key, batch):
    k1, k2, k3 = jax.random.split(key, 3)
    batch = random_hflip(k1, batch)
    batch = random_vflip(k2, batch)
    rot = jax.random.bernoulli(k3, 0.5, (batch.shape[0], 1, 1, 1))
    rotated = jnp.rot90(batch, k=1, axes=(1, 2))
    return jnp.where(rot, rotated, batch)


def color_jitter(key, batch, brightness=0.4, contrast=0.4, saturation=0.4,
                 hue=0.2, p=0.8):
    b = batch.shape[0]
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    apply = jax.random.bernoulli(k0, p, (b, 1, 1, 1))

    br = 1 + jax.random.uniform(k1, (b, 1, 1, 1), minval=-brightness,
                                maxval=brightness)
    out = batch * br
    mean = out.mean(axis=(1, 2, 3), keepdims=True)
    ct = 1 + jax.random.uniform(k2, (b, 1, 1, 1), minval=-contrast,
                                maxval=contrast)
    out = (out - mean) * ct + mean
    gray = out.mean(axis=-1, keepdims=True)
    st = 1 + jax.random.uniform(k3, (b, 1, 1, 1), minval=-saturation,
                                maxval=saturation)
    out = (out - gray) * st + gray
    # cheap hue shift: rotate channels toward their mean
    hu = jax.random.uniform(k4, (b, 1, 1, 1), minval=-hue, maxval=hue)
    out = out + hu * (jnp.roll(out, 1, axis=-1) - out)
    out = jnp.clip(out, 0.0, 1.0)
    return jnp.where(apply, out, batch)


def random_grayscale(key, batch, p=0.2):
    apply = jax.random.bernoulli(key, p, (batch.shape[0], 1, 1, 1))
    lum = (0.299 * batch[..., 0] + 0.587 * batch[..., 1]
           + 0.114 * batch[..., 2])[..., None]
    return jnp.where(apply, jnp.broadcast_to(lum, batch.shape), batch)


def random_resized_crop(key, batch, scale=(0.3, 1.0), ratio=(0.7, 1.4)):
    """Random crop of random area/aspect, resized back.

    Axis-aligned, so it lowers to `jax.image.scale_and_translate` (separable
    convolution resampling — MXU/VPU-friendly) instead of gather-based
    warping; an order of magnitude faster on TPU inside training scans.
    """
    b, h, w, _ = batch.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = jax.random.uniform(k1, (b,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(k2, (b,), minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    ch = jnp.sqrt(area / r).clip(max=1.0)  # crop height fraction
    cw = jnp.sqrt(area * r).clip(max=1.0)
    # top-left corner of the crop, uniform over the valid range
    y0 = jax.random.uniform(k3, (b,)) * (1 - ch) * h
    x0 = jax.random.uniform(k4, (b,)) * (1 - cw) * w
    # output = resize(crop): out(y) = in(y/zoom + y0) =>
    # scale_and_translate with zoom = out/in_crop, translation = -y0*zoom
    zy = h / (ch * h)
    zx = w / (cw * w)

    def one(img, zy, zx, y0, x0):
        return jax.image.scale_and_translate(
            img, (h, w, img.shape[-1]), (0, 1),
            jnp.stack([zy, zx]), jnp.stack([-y0 * zy, -x0 * zx]),
            method="linear")

    return jax.vmap(one)(batch, zy, zx, y0, x0)


def random_erasing(key, batch, value=0.5, scale=(0.02, 0.33), p=0.5):
    b, h, w, _ = batch.shape
    k0, k1, k2, k3 = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k0, p, (b, 1, 1, 1))
    area = jax.random.uniform(k1, (b,), minval=scale[0], maxval=scale[1])
    eh = (jnp.sqrt(area) * h).astype(jnp.int32).clip(1, h)
    ew = (jnp.sqrt(area) * w).astype(jnp.int32).clip(1, w)
    y0 = (jax.random.uniform(k2, (b,)) * (h - eh)).astype(jnp.int32)
    x0 = (jax.random.uniform(k3, (b,)) * (w - ew)).astype(jnp.int32)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    mask = ((yy >= y0[:, None, None]) & (yy < (y0 + eh)[:, None, None])
            & (xx >= x0[:, None, None]) & (xx < (x0 + ew)[:, None, None]))
    mask = mask[..., None]
    erased = jnp.where(mask, value, batch)
    return jnp.where(apply, erased, batch)


_REGISTRY: dict[str, Callable] = {
    "hflip": random_hflip,
    "vflip": random_vflip,
    "D4_group": d4_group,
    "color": color_jitter,
    "gray": random_grayscale,
    "resize_crop": random_resized_crop,
    "erasing": random_erasing,
}

# affine-family augmentations: (degrees, translate, scale, shear) parameter
# ranges. These COMPOSE into a single warp (one gather pass) instead of
# chaining map_coordinates per augmentation — crucial for TPU compile time
# and runtime when the augmenter sits inside a fused training scan.
_AFFINE_PARAMS = {
    "rotation": dict(degrees=45.0),
    "rotation--": dict(degrees=15.0),
    "y_translation": dict(translate=(0.0, 0.25)),
    "y_translation--": dict(translate=(0.0, 0.15)),
    "x_translation": dict(translate=(0.25, 0.0)),
    "x_translation--": dict(translate=(0.15, 0.0)),
    "shear": dict(shear=25.0),
    "shear--": dict(shear=15.0),
    "scale": dict(scale=(0.6, 1.4)),
    "scale--": dict(scale=(0.8, 1.2)),
}


def _merged_affine(names):
    degrees, shear = 0.0, 0.0
    tx, ty = 0.0, 0.0
    scale = (1.0, 1.0)
    for n in names:
        p = _AFFINE_PARAMS[n]
        degrees = max(degrees, p.get("degrees", 0.0))
        shear = max(shear, p.get("shear", 0.0))
        t = p.get("translate", (0.0, 0.0))
        tx, ty = max(tx, t[0]), max(ty, t[1])
        if "scale" in p:
            scale = p["scale"]
    return partial(_rand_affine, degrees=degrees, translate=(tx, ty),
                   scale=scale, shear=shear)


def make_augmenter(equivalence: Sequence[str]):
    """Compose the named augmentations into one jittable (key, batch) fn.

    All affine-family members fuse into a single random-affine warp; the
    remaining augmentations chain after it.
    """
    affine_names = [n for n in equivalence if n in _AFFINE_PARAMS]
    fns = []
    if affine_names:
        fns.append(_merged_affine(affine_names))
    fns.extend(_REGISTRY[n] for n in equivalence if n not in _AFFINE_PARAMS)

    def augment(key, batch):
        keys = jax.random.split(key, max(1, len(fns)))
        for fn, k in zip(fns, keys):
            batch = fn(k, batch)
        return batch

    return augment


def available_augmentations():
    return sorted(set(_REGISTRY) | set(_AFFINE_PARAMS))


def build_augmenter(equivalence):
    """Jitted batch augmenter for an equivalence tuple (falsy -> None).

    One constructor for every datamodule (ImageDataset and the external
    loaders) so default resolution / jit wrapping stay in one place.
    """
    if not equivalence:
        return None
    import jax

    return jax.jit(make_augmenter(tuple(equivalence)))
