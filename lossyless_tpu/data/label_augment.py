"""Equivariant augmentations: joint (image, label) transforms.

Batched jax equivalent of
`/root/reference/utils/data/augmentations/label_augment.py`: the crop scale
axis is split into [left-equivariant | invariant | right-equivariant] ranges.
A sample whose crop scale lands in an equivariant range gets its label
resampled uniformly with probability `p`; invariant-range crops keep the
label. Range selection probability is proportional to range width (the
reference's `pdf`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .augmentations import random_resized_crop


@dataclasses.dataclass(frozen=True)
class EquivariantRandomResizedCrop:
    invariant_scale: tuple = (0.5, 1.0)
    equivariant_scale: tuple = (0.3, 1.0)
    ratio: tuple = (0.7, 1.4)
    p: float = 1.0
    num_classes: int = 10

    def __post_init__(self):
        eq, inv = self.equivariant_scale, self.invariant_scale
        if not (eq[0] <= inv[0] and inv[1] <= eq[1]):
            raise ValueError("equivariant scale range must contain the "
                             "invariant range")

    @property
    def range_probs(self):
        eq, inv = self.equivariant_scale, self.invariant_scale
        widths = jnp.array([inv[0] - eq[0], inv[1] - inv[0], eq[1] - inv[1]])
        return widths / widths.sum()

    def __call__(self, key, batch, labels):
        """Returns (augmented_batch, possibly-resampled labels)."""
        b = batch.shape[0]
        k_range, k_crop_l, k_crop_i, k_crop_r, k_flip, k_newy = \
            jax.random.split(key, 6)
        eq, inv = self.equivariant_scale, self.invariant_scale

        which = jax.random.choice(k_range, 3, (b,), p=self.range_probs)

        # crop each sample under all three scale ranges, select per-sample
        # (static shapes; the unused crops are cheap relative to the model)
        left = random_resized_crop(k_crop_l, batch,
                                   scale=(eq[0], inv[0]), ratio=self.ratio)
        mid = random_resized_crop(k_crop_i, batch,
                                  scale=(inv[0], inv[1]), ratio=self.ratio)
        right = random_resized_crop(k_crop_r, batch,
                                    scale=(inv[1], eq[1]), ratio=self.ratio)
        sel = which[:, None, None, None]
        out = jnp.where(sel == 0, left, jnp.where(sel == 1, mid, right))

        # resample label with prob p when in an equivariant range
        flip = jax.random.bernoulli(k_flip, self.p, (b,))
        new_y = jax.random.randint(k_newy, (b,), 0, self.num_classes,
                                   dtype=labels.dtype)
        resample = flip & (which != 1)
        labels = jnp.where(resample, new_y, labels)
        return out, labels
