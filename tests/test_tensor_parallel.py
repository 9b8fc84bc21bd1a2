"""Tensor-parallel basis sharding: exact agreement with the unsharded
forward on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from st_dadk_tpu.models.st_interp import ModelSpec, forward, init_model
from st_dadk_tpu.parallel.mesh import make_mesh
from st_dadk_tpu.parallel.tensor_parallel import (make_tp_forward, place_tp,
                                                  to_tp_params,
                                                  tp_consts_specs,
                                                  tp_param_specs)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs >=4 devices")


def _inputs(n=64, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32),
            jnp.asarray(rng.uniform(size=(n, 1)), jnp.float32))


@pytest.mark.parametrize("learnable,delta", [(False, False), (True, False),
                                             (True, True)])
def test_tp_matches_unsharded(learnable, delta):
    n_dev = 4
    mesh = make_mesh({"tp": n_dev}, jax.devices()[:n_dev])
    spec = ModelSpec(k_spatial_centers=(25, 81), k_temporal_centers=(4, 6),
                     hidden_dims=(32, 16), dropout=0.0,
                     spatial_learnable=learnable,
                     output_dim=5 if delta else 1,
                     use_delta_reparameterization=delta)
    params, consts = init_model(jax.random.PRNGKey(0), spec)
    coords, t = _inputs(96, 1)

    want = np.asarray(forward(spec, params, consts, None, coords, t))

    tp_params, tp_consts = to_tp_params(spec, params, consts, n_dev)
    # 106 centers pad to 108? -> to multiple of 4 = 108
    assert tp_params["mlp"]["w0_spatial"].shape[0] % n_dev == 0
    tp_params = place_tp(tp_params, tp_param_specs(spec), mesh)
    tp_consts = place_tp(tp_consts, tp_consts_specs(), mesh)
    fwd = make_tp_forward(spec, mesh)
    got = np.asarray(fwd(tp_params, tp_consts, coords, t))

    assert got.shape == want.shape
    assert np.allclose(got, want, atol=5e-5), np.abs(got - want).max()


def test_tp_rejects_covariates():
    spec = ModelSpec(p=3, k_spatial_centers=(9,), k_temporal_centers=(4,),
                     hidden_dims=(8,), dropout=0.0)
    params, consts = init_model(jax.random.PRNGKey(0), spec)
    with pytest.raises(NotImplementedError):
        to_tp_params(spec, params, consts, 4)
