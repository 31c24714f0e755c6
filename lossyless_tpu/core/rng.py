"""Host-side RNG helpers.

`tmp_seed` mirrors the reference helper (helpers.py:131-150): a context that
temporarily seeds numpy's global RNG for deterministic host-side data
generation, restoring the previous state after. Device-side randomness uses
explicit jax PRNG keys throughout and never needs this.
"""

from __future__ import annotations

import contextlib

import numpy as np


@contextlib.contextmanager
def tmp_seed(seed: int | None):
    if seed is None:
        yield
        return
    state = np.random.get_state()
    np.random.seed(seed)
    try:
        yield
    finally:
        np.random.set_state(state)
