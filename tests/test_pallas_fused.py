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


class TestFusedTrainingKernel:
    """The differentiable fused basis->layer-1 kernel (custom VJP): values
    and ALL gradients must be bit-close to the unfused autodiff path."""

    @pytest.mark.parametrize("basis", ["wendland", "gaussian", "triangular"])
    def test_value_and_grads(self, basis):
        from st_dadk_tpu.ops.pallas_fused import fused_spatial_first_layer

        rng = np.random.default_rng(2)
        coords = jnp.asarray(rng.uniform(size=(200, 2)), jnp.float32)
        centers = jnp.asarray(rng.uniform(size=(106, 2)), jnp.float32)
        bw = jnp.asarray(rng.uniform(0.1, 0.8, size=(106,)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(106, 48)) * 0.1, jnp.float32)
        G = jnp.asarray(rng.normal(size=(200, 48)), jnp.float32)

        def loss_fused(coords, centers, bw, w):
            return jnp.sum(fused_spatial_first_layer(
                coords, centers, bw, w, basis) * G)

        def loss_ref(coords, centers, bw, w):
            return jnp.sum(
                (spatial_basis_embed(coords, centers, bw, basis) @ w) * G)

        v1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3))(
            coords, centers, bw, w)
        v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
            coords, centers, bw, w)
        assert np.isclose(float(v1), float(v2), rtol=1e-5)
        names = ("dcoords", "dcenters", "dbandwidths", "dW")
        for a, b, name in zip(g1, g2, names):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5, err_msg=name)

    def test_training_loss_grad_parity(self):
        """Full composite training gradient: fused forward (use_pallas) vs
        unfused, learnable basis + delta head + penalties."""
        from st_dadk_tpu.config import ExperimentConfig
        from st_dadk_tpu.train.loop import LoopSpec, training_loss

        cfg = ExperimentConfig.from_dict(dict(
            k_spatial_centers=[25, 81], k_temporal_centers=[4],
            hidden_dims=[32, 16], dropout=0.0, epochs=1,
            regression_type="multi-quantile",
            quantile_levels=[0.05, 0.25, 0.5, 0.75, 0.95],
            use_delta_reparameterization=True, non_crossing_lambda=1.0,
            spatial_learnable=True, domain_penalty_weight=0.01,
            movement_penalty_weight=0.001,
            sparsity_penalty_type="sparse_group",
            sparsity_lambda_l1=1e-4, sparsity_lambda_group=1e-4,
            use_fused_training=True))
        rng = np.random.default_rng(3)
        coords = jnp.asarray(rng.uniform(size=(128, 2)), jnp.float32)
        t = jnp.asarray(rng.uniform(size=(128, 1)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(128, 1)), jnp.float32)
        w = jnp.ones((128,), jnp.float32)

        grads = {}
        for use_pallas in (False, True):
            from st_dadk_tpu.models.st_interp import (init_model,
                                                      spec_from_config)
            spec_m = spec_from_config(cfg, use_pallas=use_pallas)
            params, consts = init_model(jax.random.PRNGKey(0), spec_m)
            spec_l = LoopSpec.from_config(cfg, spec_m, 128, 1, 128, 1)
            loss, g = jax.value_and_grad(
                lambda p: training_loss(spec_l, p, consts, coords, t, y, w,
                                        train=True, rng=None))(params)
            grads[use_pallas] = (float(loss), g)

        assert np.isclose(grads[False][0], grads[True][0], rtol=1e-5)
        flat_f = jax.tree_util.tree_leaves_with_path(grads[False][1])
        flat_t = jax.tree_util.tree_leaves(grads[True][1])
        for (path, a), b in zip(flat_f, flat_t):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5,
                err_msg=jax.tree_util.keystr(path))
