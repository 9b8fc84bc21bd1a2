"""Seeding discipline (API parity with stnf/utils/seed.py:9-27).

JAX randomness is explicit-key based, so "global" seeding here means: seed
python/numpy (whose global RNGs drive mask sampling and init subsampling,
matching the reference's np.random usage) and hand back a root jax PRNG key
for everything on-device. There is no cudnn-style nondeterminism to pin.
"""
from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int):
    """Seed host RNGs and return the root jax PRNG key for the run."""
    random.seed(seed)
    np.random.seed(seed)
    import jax
    return jax.random.PRNGKey(seed)
