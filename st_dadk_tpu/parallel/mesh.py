"""Device-mesh construction and sharding helpers.

The framework's parallel axes (SURVEY.md section 2.4):
  - 'exp'  : experiment repeats / same-shaped grid-search configs — the
             primary axis; embarrassingly parallel, zero steady-state
             collectives. Replaces the reference's joblib process pools
             (train_st_interp.py:2945-2991, run_grid_search.py:331-387).
  - 'data' : data parallelism inside one fit (pmean gradient sync over ICI)
             for large single fits.

Meshes nest: make_mesh({"exp": 4, "data": 2}) on 8 devices runs 4 experiment
lanes each data-parallel over 2 chips.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a Mesh; defaults to all devices on one 'exp' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"exp": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    if n != len(devices):
        raise ValueError(f"mesh {axes} needs {n} devices, have {len(devices)}")
    return Mesh(np.array(devices).reshape(shape), names)


def lane_sharding(mesh: Mesh, axis: str = "exp") -> NamedSharding:
    """Shard the leading (lane) axis of every array over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


