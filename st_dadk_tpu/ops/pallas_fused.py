"""Fused Pallas kernels: basis construction + first-layer matmul.

The model evaluates phi(coords) (N, k) and immediately contracts it with the
first MLP layer's spatial rows W (k, H). Materializing phi in HBM costs
N*k*4 bytes of traffic each way (the model's largest intermediate:
100k x 227 = 91 MB per dense grid). These kernels compute each (TN, TK)
basis tile on the VPU and feed it straight into an MXU matmul, accumulating
h1 = phi @ W tile-by-tile in VMEM — one pass over coords/W, zero HBM traffic
for phi.

Two entry points:
  - `fused_basis_matmul` — forward-only, serves `predict` / dense eval.
  - `fused_spatial_first_layer` — TRAINING-mode variant with a custom VJP
    whose backward kernels keep BOTH (N, k) intermediates out of HBM:
    dW = phi^T g recomputes phi per tile, and the dcoords/dcenters/dibw
    kernels compute the cotangent gw = g @ W^T on the MXU per tile and chain
    it through dphi/dr in registers. Gradients are bit-close to the unfused
    autodiff path (tests/test_pallas_fused.py).

Parity with the unfused path is tested in tests/test_pallas_fused.py.
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
from st_dadk_tpu.ops.pallas_basis import _dphi, _phi

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


# ---------------------------------------------------------------------------
# Training-mode fused first layer (custom VJP)
# ---------------------------------------------------------------------------

def _pad_inputs(coords, centers, inv_bw):
    n, k = coords.shape[0], centers.shape[0]
    n_pad, k_pad = _round_up(n, TN), _round_up(k, TK)
    x = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(coords[:, 0])
    y = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(coords[:, 1])
    cx = jnp.zeros((1, k_pad), jnp.float32).at[0, :k].set(centers[:, 0])
    cy = jnp.zeros((1, k_pad), jnp.float32).at[0, :k].set(centers[:, 1])
    ibw = jnp.zeros((1, k_pad), jnp.float32).at[0, :k].set(inv_bw)
    return x, y, cx, cy, ibw, n_pad, k_pad


def _bwd_w_kernel(basis_id, x_ref, y_ref, cx_ref, cy_ref, ibw_ref, g_ref,
                  dw_out):
    """dW (TK, H) += phi_tile^T @ g_tile, phi recomputed on the VPU
    (grid: centers x points, points fastest)."""
    i = pl.program_id(1)
    dx = x_ref[:] - cx_ref[:]
    dy = y_ref[:] - cy_ref[:]
    r = jnp.sqrt(dx * dx + dy * dy) * ibw_ref[:]
    phi = _phi(r, basis_id)

    @pl.when(i == 0)
    def _():
        dw_out[:] = jnp.zeros_like(dw_out)

    dw_out[:] += jnp.dot(phi.T, g_ref[:],
                         preferred_element_type=jnp.float32)


def _bwd_pts_kernel(basis_id, x_ref, y_ref, cx_ref, cy_ref, ibw_ref, g_ref,
                    w_ref, dx_out, dy_out):
    """dL/dcoords: gw = g @ W^T per tile (MXU), chained through dphi/dr
    (grid: points x centers, centers fastest)."""
    j = pl.program_id(1)
    dx = x_ref[:] - cx_ref[:]
    dy = y_ref[:] - cy_ref[:]
    d = jnp.sqrt(dx * dx + dy * dy)
    r = d * ibw_ref[:]
    gw = jnp.dot(g_ref[:], w_ref[:].T,
                 preferred_element_type=jnp.float32)        # (TN, TK)
    safe = jnp.maximum(d, 1e-12)
    coef = gw * _dphi(r, basis_id) * ibw_ref[:] / safe

    @pl.when(j == 0)
    def _():
        dx_out[:] = jnp.zeros_like(dx_out)
        dy_out[:] = jnp.zeros_like(dy_out)

    dx_out[:] += jnp.sum(coef * dx, axis=1, keepdims=True)
    dy_out[:] += jnp.sum(coef * dy, axis=1, keepdims=True)


def _bwd_ctr_kernel(basis_id, x_ref, y_ref, cx_ref, cy_ref, ibw_ref, g_ref,
                    w_ref, dcx_out, dcy_out, dibw_out):
    """dL/dcenters and dL/dinv_bw (grid: centers x points, points fastest)."""
    i = pl.program_id(1)
    dx = x_ref[:] - cx_ref[:]
    dy = y_ref[:] - cy_ref[:]
    d = jnp.sqrt(dx * dx + dy * dy)
    r = d * ibw_ref[:]
    gw = jnp.dot(g_ref[:], w_ref[:].T,
                 preferred_element_type=jnp.float32)        # (TN, TK)
    gphi = gw * _dphi(r, basis_id)
    safe = jnp.maximum(d, 1e-12)
    coef = gphi * ibw_ref[:] / safe

    @pl.when(i == 0)
    def _():
        dcx_out[:] = jnp.zeros_like(dcx_out)
        dcy_out[:] = jnp.zeros_like(dcy_out)
        dibw_out[:] = jnp.zeros_like(dibw_out)

    dcx_out[:] += -jnp.sum(coef * dx, axis=0, keepdims=True)
    dcy_out[:] += -jnp.sum(coef * dy, axis=0, keepdims=True)
    dibw_out[:] += jnp.sum(gphi * d, axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_train_core(coords, centers, inv_bw, w, basis_id):
    return _fused_train_fwd(coords, centers, inv_bw, w, basis_id)[0]


def _fused_train_fwd(coords, centers, inv_bw, w, basis_id):
    n, k = coords.shape[0], centers.shape[0]
    h = w.shape[1]
    x, y, cx, cy, ibw, n_pad, k_pad = _pad_inputs(coords, centers, inv_bw)
    h_pad = _round_up(h, 128)
    w_p = jnp.zeros((k_pad, h_pad), jnp.float32).at[:k, :h].set(
        w.astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fused_kernel, basis_id),
        out_shape=jax.ShapeDtypeStruct((n_pad, h_pad), jnp.float32),
        grid=(n_pad // TN, k_pad // TK),
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
    )(x, y, cx, cy, ibw, w_p)
    return out[:n, :h], (coords, centers, inv_bw, w)


def _fused_train_bwd(basis_id, residuals, g):
    coords, centers, inv_bw, w = residuals
    n, k = coords.shape[0], centers.shape[0]
    h = w.shape[1]
    x, y, cx, cy, ibw, n_pad, k_pad = _pad_inputs(coords, centers, inv_bw)
    h_pad = _round_up(h, 128)
    g_p = jnp.zeros((n_pad, h_pad), jnp.float32).at[:n, :h].set(
        g.astype(jnp.float32))
    w_p = jnp.zeros((k_pad, h_pad), jnp.float32).at[:k, :h].set(
        w.astype(jnp.float32))

    col = lambda io: pl.BlockSpec((1, TK), io, memory_space=pltpu.VMEM)
    pt = lambda io: pl.BlockSpec((TN, 1), io, memory_space=pltpu.VMEM)

    # dW: centers-major grid
    dw = pl.pallas_call(
        functools.partial(_bwd_w_kernel, basis_id),
        out_shape=jax.ShapeDtypeStruct((k_pad, h_pad), jnp.float32),
        grid=(k_pad // TK, n_pad // TN),
        in_specs=[
            pt(lambda j, i: (i, 0)), pt(lambda j, i: (i, 0)),
            col(lambda j, i: (0, j)), col(lambda j, i: (0, j)),
            col(lambda j, i: (0, j)),
            pl.BlockSpec((TN, h_pad), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TK, h_pad), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
    )(x, y, cx, cy, ibw, g_p)

    # dcoords: points-major grid
    dxy = pl.pallas_call(
        functools.partial(_bwd_pts_kernel, basis_id),
        out_shape=(jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)),
        grid=(n_pad // TN, k_pad // TK),
        in_specs=[
            pt(lambda i, j: (i, 0)), pt(lambda i, j: (i, 0)),
            col(lambda i, j: (0, j)), col(lambda i, j: (0, j)),
            col(lambda i, j: (0, j)),
            pl.BlockSpec((TN, h_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, h_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pt(lambda i, j: (i, 0)), pt(lambda i, j: (i, 0))),
    )(x, y, cx, cy, ibw, g_p, w_p)

    # dcenters / dinv_bw: centers-major grid
    dc = pl.pallas_call(
        functools.partial(_bwd_ctr_kernel, basis_id),
        out_shape=(jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, k_pad), jnp.float32)),
        grid=(k_pad // TK, n_pad // TN),
        in_specs=[
            pt(lambda j, i: (i, 0)), pt(lambda j, i: (i, 0)),
            col(lambda j, i: (0, j)), col(lambda j, i: (0, j)),
            col(lambda j, i: (0, j)),
            pl.BlockSpec((TN, h_pad), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, h_pad), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(col(lambda j, i: (0, j)), col(lambda j, i: (0, j)),
                   col(lambda j, i: (0, j))),
    )(x, y, cx, cy, ibw, g_p, w_p)

    dcoords = jnp.concatenate([dxy[0][:n], dxy[1][:n]], axis=1)
    dcenters = jnp.stack([dc[0][0, :k], dc[1][0, :k]], axis=1)
    dinv_bw = dc[2][0, :k]
    return dcoords, dcenters, dinv_bw, dw[:k, :h]


_fused_train_core.defvjp(_fused_train_fwd, _fused_train_bwd)


def fused_spatial_first_layer(coords: jax.Array, centers: jax.Array,
                              bandwidths: jax.Array, w_spatial: jax.Array,
                              basis_function: str = "wendland") -> jax.Array:
    """Differentiable fused h1_spatial = phi(coords) @ w_spatial.

    The bandwidth/calibration transform stays in jnp so gradients reach
    (log-)bandwidths through d/d inv_bw; gradients for centers, bandwidths,
    and w_spatial all come from Pallas backward kernels with zero HBM
    traffic for the (N, k) intermediates."""
    calibration = CALIBRATION_FACTORS[basis_function]
    inv_bw = 1.0 / (bandwidths * calibration)
    return _fused_train_core(coords.astype(jnp.float32),
                             centers.astype(jnp.float32),
                             inv_bw.astype(jnp.float32),
                             w_spatial,
                             BASIS_IDS[basis_function])


def fused_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"
