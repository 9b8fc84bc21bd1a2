"""Seeding discipline (API parity with stnf/utils/seed.py:9-27).

JAX randomness is explicit-key based, so "global" seeding here means: seed
python/numpy (whose global RNGs drive mask sampling and init subsampling,
matching the reference's np.random usage) and hand back a root jax PRNG key
for everything on-device. There is no cudnn-style nondeterminism to pin.
"""
from __future__ import annotations

import random
import threading

import numpy as np

# Serializes every section that seeds/restores-and-draws from the GLOBAL
# numpy RNG (mask sampling in ExperimentSetup, subsample/site draws in
# init_spatial_centers_batch). Those sections are individually deterministic
# (each re-seeds or set_state()s before drawing), so mutual exclusion alone
# preserves bit-exactness when the pipelined batch engine runs host
# preparation of batch k+1 on a thread while batch k trains (see
# train/batch_engine.py::run_job_batches). RLock: the sequential init path
# is reachable from inside an already-locked batch-init section.
GLOBAL_NP_RNG_LOCK = threading.RLock()


def set_seed(seed: int):
    """Seed host RNGs and return the root jax PRNG key for the run."""
    random.seed(seed)
    np.random.seed(seed)
    import jax
    return jax.random.PRNGKey(seed)
