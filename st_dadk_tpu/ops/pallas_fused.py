"""Fused Pallas kernel: basis construction + first-layer matmul.

The dense-field inference path evaluates phi(coords) (N, k) and immediately
contracts it with the first MLP layer's spatial rows W (k, H). Materializing
phi in HBM costs N*k*4 bytes of traffic each way (the model's largest
intermediate: 100k x 227 = 91 MB per dense grid). This kernel computes each
(TN, TK) basis tile on the VPU and feeds it straight into an MXU matmul,
accumulating h1 = phi @ W tile-by-tile in VMEM — one pass over coords/W,
zero HBM traffic for phi.

Forward-only by design: it serves `predict` / dense evaluation (the training
step needs phi's VJP and uses ops.pallas_basis instead). Parity with the
unfused path is tested in tests/test_pallas_fused.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from st_dadk_tpu.ops.basis import BASIS_IDS, CALIBRATION_FACTORS
from st_dadk_tpu.ops.pallas_basis import _phi

TN = 512   # points per tile
TK = 128   # centers per tile (lane width)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_kernel(basis_id, x_ref, y_ref, cx_ref, cy_ref, ibw_ref, w_ref,
                  out_ref):
    j = pl.program_id(1)
    dx = x_ref[:] - cx_ref[:]                    # (TN, TK)
    dy = y_ref[:] - cy_ref[:]
    r = jnp.sqrt(dx * dx + dy * dy) * ibw_ref[:]
    phi = _phi(r, basis_id)                      # (TN, TK) on the VPU

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.dot(phi, w_ref[:],          # MXU
                          preferred_element_type=jnp.float32)


def fused_basis_matmul(coords: jax.Array, centers: jax.Array,
                       bandwidths: jax.Array, w_spatial: jax.Array,
                       basis_function: str = "wendland") -> jax.Array:
    """h1_spatial = phi(coords; centers, bandwidths) @ w_spatial, fused.

    coords (N, 2), centers (k, 2), bandwidths (k,), w_spatial (k, H)
    -> (N, H) float32. Padded K columns carry zero weight rows, so they
    contribute nothing regardless of their basis values.
    """
    n, k = coords.shape[0], centers.shape[0]
    h = w_spatial.shape[1]
    n_pad, k_pad = _round_up(n, TN), _round_up(k, TK)
    h_pad = _round_up(h, 128)

    calibration = CALIBRATION_FACTORS[basis_function]
    inv_bw = (1.0 / (bandwidths * calibration)).astype(jnp.float32)

    x = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(coords[:, 0])
    y = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(coords[:, 1])
    cx = jnp.zeros((1, k_pad), jnp.float32).at[0, :k].set(centers[:, 0])
    cy = jnp.zeros((1, k_pad), jnp.float32).at[0, :k].set(centers[:, 1])
    ibw = jnp.zeros((1, k_pad), jnp.float32).at[0, :k].set(inv_bw)
    w = jnp.zeros((k_pad, h_pad), jnp.float32).at[:k, :h].set(
        w_spatial.astype(jnp.float32))

    grid = (n_pad // TN, k_pad // TK)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, BASIS_IDS[basis_function]),
        out_shape=jax.ShapeDtypeStruct((n_pad, h_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, h_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, h_pad), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k_pad * h_pad + 12 * n_pad * k_pad,
            transcendentals=n_pad * k_pad,
            bytes_accessed=4 * (n_pad * h_pad + k_pad * h_pad + 2 * n_pad
                                + 3 * k_pad)),
    )(x, y, cx, cy, ibw, w)
    return out[:n, :h]


def fused_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"
