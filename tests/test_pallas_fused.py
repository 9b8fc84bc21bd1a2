"""Fused basis->layer-1 kernel parity vs the unfused forward (interpret mode
on CPU; the compiled kernel on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from st_dadk_tpu.models.st_interp import (ModelSpec, forward,
                                          forward_inference_fused, init_model)
from st_dadk_tpu.ops.basis import spatial_basis_embed
from st_dadk_tpu.ops.pallas_fused import fused_basis_matmul

ON_TPU = jax.default_backend() == "tpu"


@pytest.fixture(autouse=True)
def _interpret_mode():
    if not ON_TPU:
        try:
            from jax.experimental.pallas import tpu as pltpu
        except Exception:
            pytest.skip("pallas tpu backend unavailable")
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


@pytest.mark.parametrize("basis", ["wendland", "gaussian"])
def test_fused_matmul_parity(basis):
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(size=(200, 2)), jnp.float32)
    centers = jnp.asarray(rng.uniform(size=(106, 2)), jnp.float32)
    bw = jnp.asarray(rng.uniform(0.1, 0.8, size=(106,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(106, 48)) * 0.1, jnp.float32)

    got = fused_basis_matmul(coords, centers, bw, w, basis)
    want = spatial_basis_embed(coords, centers, bw, basis) @ w
    assert got.shape == (200, 48)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("learnable,delta", [(False, False), (True, True)])
def test_fused_forward_parity(learnable, delta):
    spec = ModelSpec(k_spatial_centers=(25, 81), k_temporal_centers=(4, 6),
                     hidden_dims=(32, 16), dropout=0.1,
                     spatial_learnable=learnable,
                     output_dim=5 if delta else 1,
                     use_delta_reparameterization=delta)
    params, consts = init_model(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(1)
    coords = jnp.asarray(rng.uniform(size=(96, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(96, 1)), jnp.float32)

    want = np.asarray(forward(spec, params, consts, None, coords, t,
                              train=False))
    got = np.asarray(forward_inference_fused(spec, params, consts, coords, t))
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=5e-5), np.abs(got - want).max()
