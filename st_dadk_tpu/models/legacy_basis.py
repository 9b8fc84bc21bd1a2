"""Legacy standalone Wendland basis embedding.

Role parity with stnf/models/basis_embedding.py (the reference's older module
with hard-coded multi-resolution grids 5x5 (theta=0.625), 9x9 (theta=0.3125),
11x11 (theta=0.25); kept but unused by its scripts). NOTE: the reference's
docstring and banner claim 250 centers, but its grid configs actually build
25 + 81 + 121 = 227 (basis_embedding.py:86-90) — this module matches the
actual behavior. Thin wrapper over the shared basis ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from st_dadk_tpu.ops.basis import spatial_basis_embed, wendland_c4

LEGACY_GRIDS = ((25, 0.625), (81, 0.3125), (121, 0.25))


def wendland_phi(r: jax.Array) -> jax.Array:
    """phi(r) = (1-r)^6_+ (35 r^2 + 18 r + 3)/3 (ref basis_embedding.py:13-26)."""
    return wendland_c4(r)


def legacy_centers_and_bandwidths():
    """Hard-coded 5x5 / 9x9 / 11x11 grids with fixed theta per resolution."""
    centers, bws = [], []
    for k, theta in LEGACY_GRIDS:
        side = int(np.sqrt(k))
        ax = np.linspace(0.0, 1.0, side, dtype=np.float64)
        xx, yy = np.meshgrid(ax, ax, indexing="ij")
        centers.append(np.stack([xx.ravel(), yy.ravel()], -1).astype(np.float32))
        bws.append(np.full((k,), theta, np.float32))
    return np.concatenate(centers), np.concatenate(bws)


def embed(coords: jax.Array) -> jax.Array:
    """(N, 2) coords in [0,1]^2 -> (N, 227) Wendland basis values."""
    centers, bws = legacy_centers_and_bandwidths()
    return spatial_basis_embed(coords, jnp.asarray(centers),
                               jnp.asarray(bws), "wendland")


if __name__ == "__main__":
    # inline smoke test (the reference module carries one too, :156-173)
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(size=(32, 2)), jnp.float32)
    phi = embed(coords)
    assert phi.shape == (32, 227)
    assert float(phi.min()) >= 0.0 and float(phi.max()) <= 1.0 + 1e-6
    print("legacy basis OK:", phi.shape)
