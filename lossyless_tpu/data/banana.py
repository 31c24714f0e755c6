"""Banana 2-D toy source with exact group actions and max-invariants.

Numpy reimplementation of `/root/reference/utils/data/distributions.py`:
a Gaussian pushed through a curvature transform, rotated and shifted, with
rotation / x- / y-translation equivalences. Host-side data generation
(cheap); batches are fed to the device as plain arrays.

Semantics preserved:
* sample ~ BananaDistribution (curvature .05, factor 6, scale 1/2,
  angle -40°, location (-1.5,-2)*scale)
* max_invariant: L2 norm (rotation) / x (y-translation) / y (x-translation)
* `additional_target="representative"` (VIC): aux target is the canonical
  orbit representative; the input itself is resampled uniformly on the orbit
  of the representative (distributions.py:59-71)
* `additional_target="input"` (VAE): aux target is x itself.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def device_sample_batch(key, batch_size: int, equivalence: str = "rotation",
                        additional_target: str = "representative"):
    """Generate one (x, Mx, aux) banana batch fully on device (pure jax).

    TPU-first path: the banana source is generative, so an entire epoch
    (sampling + group actions + training) can fuse into a single jit/scan
    program with zero host->device traffic. Semantics match the host
    `BananaDataset` (same distribution, invariants, representatives).
    """
    import jax
    import jax.numpy as jnp

    k_base, k_act, k_equiv = jax.random.split(key, 3)
    d = BananaDistribution()
    std = jnp.array([d.factor * d.scale, d.scale], jnp.float32)
    x = jax.random.normal(k_base, (batch_size, 2)) * std
    curv, fac = d.curvature / d.scale, d.factor * d.scale
    x = x.at[:, 1].add(curv * (x[:, 0] ** 2 - fac ** 2))
    a = jnp.deg2rad(d.angle)
    rot = jnp.array([[jnp.cos(a), -jnp.sin(a)], [jnp.sin(a), jnp.cos(a)]])
    x = x @ rot.T + jnp.asarray(d.location) * d.scale

    if equivalence == "rotation":
        mx = jnp.linalg.norm(x, axis=-1, keepdims=True)
        left = jnp.concatenate([-mx, jnp.zeros_like(mx)], -1)
        a45 = jnp.deg2rad(45.0)
        r45 = jnp.array([[jnp.cos(a45), -jnp.sin(a45)],
                         [jnp.sin(a45), jnp.cos(a45)]])
        rep = left @ r45.T
        if additional_target == "representative":
            # didactic orbit resampling (reference distributions.py:59-71)
            ang = jax.random.uniform(k_act, (batch_size,)) * 2 * jnp.pi
            c, s = jnp.cos(ang), jnp.sin(ang)
            x = jnp.stack([c * rep[:, 0] - s * rep[:, 1],
                           s * rep[:, 0] + c * rep[:, 1]], -1)
            aux = rep
        elif additional_target == "input":
            aux = x
        elif additional_target == "equiv_x":
            # another sample from the SAME orbit (contrastive positive,
            # reference base.py toadd_target "equiv_x")
            ang = jax.random.uniform(k_equiv, (batch_size,)) * 2 * jnp.pi
            c, s = jnp.cos(ang), jnp.sin(ang)
            aux = jnp.stack([c * x[:, 0] - s * x[:, 1],
                             s * x[:, 0] + c * x[:, 1]], -1)
        else:
            aux = mx
    elif equivalence in ("x_translation", "y_translation"):
        axis = 0 if equivalence == "y_translation" else 1
        jitter_axis = 1 - axis
        mx = x[:, axis:axis + 1]
        rep = jnp.zeros_like(x).at[:, axis].set(mx[:, 0])
        if additional_target == "representative":
            # orbit resampling like the host path (distributions.py:91-99):
            # uniform translation within the source's 10/90% quantile range
            # (constants precomputed from 1e6 BananaDistribution samples)
            lo, hi = ((-3.30, 2.59) if jitter_axis == 0 else (-3.03, 1.93))
            jit = jax.random.uniform(k_act, (batch_size,), minval=lo,
                                     maxval=hi)
            x = rep.at[:, jitter_axis].add(jit)
            aux = rep
        elif additional_target == "input":
            aux = x
        elif additional_target == "equiv_x":
            # same orbit = same invariant coordinate, fresh translation
            lo, hi = ((-3.30, 2.59) if jitter_axis == 0 else (-3.03, 1.93))
            jit = jax.random.uniform(k_equiv, (batch_size,), minval=lo,
                                     maxval=hi)
            aux = x.at[:, jitter_axis].set(jit)
        else:
            aux = mx
    else:
        mx = x
        aux = x if additional_target in ("representative", "input") else mx
    return x, mx, aux


def rotate(x: np.ndarray, angle_deg) -> np.ndarray:
    """Rotate 2D points by `angle_deg` degrees (utils/data/helpers.py:58-63)."""
    a = np.deg2rad(angle_deg)
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, -s], [s, c]], dtype=x.dtype)
    return x @ rot.T


@dataclasses.dataclass
class BananaDistribution:
    curvature: float = 0.05
    factor: float = 6.0
    location: tuple = (-1.5, -2.0)
    angle: float = -40.0
    scale: float = 0.5

    def sample(self, n: int, rng: np.random.Generator) -> np.ndarray:
        std = np.array([self.factor * self.scale, self.scale], np.float32)
        x = rng.normal(0.0, 1.0, (n, 2)).astype(np.float32) * std
        # banana shift
        curv = self.curvature / self.scale
        fac = self.factor * self.scale
        shift = np.zeros_like(x)
        shift[:, 1] = curv * (x[:, 0] ** 2 - fac ** 2)
        x = x + shift
        x = rotate(x, self.angle)
        return x + np.asarray(self.location, np.float32) * self.scale


@dataclasses.dataclass
class BananaDataset:
    """In-memory banana dataset with equivalence machinery."""

    length: int = 102400
    equivalence: str | None = "rotation"  # rotation|x_translation|y_translation|None
    additional_target: str = "representative"  # representative|input|target
    seed: int | None = 123

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        self.distribution = BananaDistribution()
        self.data = self.distribution.sample(self.length, rng)
        self.targets = self.max_invariant(self.data)
        # quantiles for translation action ranges (distributions.py:53-55)
        self.min_x, self.min_y = np.quantile(self.data, 0.1, axis=0)
        self.max_x, self.max_y = np.quantile(self.data, 0.9, axis=0)
        self._rng = rng

    def __len__(self):
        return self.length

    def max_invariant(self, samples: np.ndarray) -> np.ndarray:
        if self.equivalence == "rotation":
            return np.linalg.norm(samples, axis=-1, keepdims=True)
        if self.equivalence == "y_translation":
            return samples[:, :1]
        if self.equivalence == "x_translation":
            return samples[:, 1:]
        if self.equivalence is None:
            return samples
        raise ValueError(f"unknown equivalence={self.equivalence}")

    def representative(self, mx: np.ndarray) -> np.ndarray:
        if self.equivalence == "rotation":
            left = np.concatenate([-mx, np.zeros_like(mx)], axis=-1)
            return rotate(left, 45.0)
        if self.equivalence == "y_translation":
            return np.concatenate([mx, np.zeros_like(mx)], axis=-1)
        if self.equivalence == "x_translation":
            return np.concatenate([np.zeros_like(mx), mx], axis=-1)
        if self.equivalence is None:
            return mx
        raise ValueError(f"unknown equivalence={self.equivalence}")

    def sample_action(self, rep: np.ndarray, rng) -> np.ndarray:
        if self.equivalence == "rotation":
            angles = rng.uniform(0, 360, size=(rep.shape[0],))
            a = np.deg2rad(angles).astype(np.float32)
            c, s = np.cos(a), np.sin(a)
            x, y = rep[:, 0], rep[:, 1]
            return np.stack([c * x - s * y, s * x + c * y], axis=-1)
        if self.equivalence == "y_translation":
            jit = rng.uniform(self.min_y, self.max_y, (rep.shape[0],))
            out = rep.copy()
            out[:, 1] += jit.astype(np.float32)
            return out
        if self.equivalence == "x_translation":
            jit = rng.uniform(self.min_x, self.max_x, (rep.shape[0],))
            out = rep.copy()
            out[:, 0] += jit.astype(np.float32)
            return out
        return rep

    def device_sampler(self, batch_size: int):
        """Device-side batch generator (fresh samples each call — the
        banana source is generative, reference reload_dataloaders_every_epoch
        semantics)."""
        eq, at = self.equivalence, self.additional_target

        def sample(key):
            return device_sample_batch(key, batch_size, equivalence=eq,
                                       additional_target=at)

        return sample

    def batches(self, batch_size: int, n_epochs: int = 1, seed: int = 0):
        """Yield (x, y, aux_target) numpy batches."""
        rng = np.random.default_rng(seed)
        for _ in range(n_epochs):
            perm = rng.permutation(self.length)
            for i in range(0, self.length - batch_size + 1, batch_size):
                idx = perm[i:i + batch_size]
                x = self.data[idx]
                mx = self.targets[idx]
                if self.additional_target == "representative":
                    rep = self.representative(mx)
                    # didactic resampling on the orbit (distributions.py:59-71)
                    x = self.sample_action(rep, rng)
                    aux = rep
                elif self.additional_target == "input":
                    aux = x
                elif self.additional_target == "equiv_x":
                    # a second, independent sample from the same orbit
                    # (contrastive positive — reference base.py:93-109
                    # toadd_target "equiv_x" via get_equiv_x)
                    aux = self.sample_action(self.representative(mx), rng)
                elif self.additional_target == "target":
                    aux = mx
                else:
                    raise ValueError(self.additional_target)
                yield x, mx, aux
