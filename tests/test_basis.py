"""Unit tests for basis functions and embeddings (hand-computed values)."""
import jax.numpy as jnp
import numpy as np
import pytest

from st_dadk_tpu.ops.basis import (
    CALIBRATION_FACTORS,
    apply_basis,
    gaussian_rbf,
    spatial_basis_embed,
    temporal_basis_embed,
    temporal_grid_centers,
    triangular_basis,
    uniform_grid_centers,
    wendland_c4,
)


class TestWendland:
    def test_at_zero(self):
        # phi(0) = 1 * (0 + 0 + 3)/3 = 1
        assert np.isclose(float(wendland_c4(jnp.array(0.0))), 1.0)

    def test_at_one_and_beyond(self):
        assert float(wendland_c4(jnp.array(1.0))) == 0.0
        assert float(wendland_c4(jnp.array(2.5))) == 0.0  # clamped

    def test_hand_value(self):
        # r=0.5: (0.5)^6 * (35*0.25 + 9 + 3)/3 = 0.015625 * 20.75/3
        r = 0.5
        expected = (1 - r) ** 6 * (35 * r**2 + 18 * r + 3) / 3
        assert np.isclose(float(wendland_c4(jnp.array(r))), expected, atol=1e-7)

    def test_monotone_decreasing(self):
        r = jnp.linspace(0, 1, 101)
        vals = np.asarray(wendland_c4(r))
        assert np.all(np.diff(vals) <= 1e-7)


class TestOtherBases:
    def test_gaussian(self):
        assert np.isclose(float(gaussian_rbf(jnp.array(0.0))), 1.0)
        assert np.isclose(float(gaussian_rbf(jnp.array(2.0))),
                          np.exp(-2.0), atol=1e-7)

    def test_triangular(self):
        assert np.isclose(float(triangular_basis(jnp.array(0.25))), 0.75)
        assert float(triangular_basis(jnp.array(1.5))) == 0.0

    def test_dispatch(self):
        r = jnp.array([0.3])
        assert np.isclose(float(apply_basis(r, "wendland")[0]),
                          float(wendland_c4(r)[0]))
        with pytest.raises(ValueError):
            apply_basis(r, "cubic")

    def test_calibration_factors(self):
        # reference values (stnf/models/st_interp.py:56-60)
        assert CALIBRATION_FACTORS["wendland"] == 1.0
        assert np.isclose(CALIBRATION_FACTORS["gaussian"], 0.223477)
        assert np.isclose(CALIBRATION_FACTORS["triangular"], 0.654714)


class TestUniformGrid:
    def test_shapes_and_bandwidths(self):
        centers, bw = uniform_grid_centers([25, 81, 121])
        assert centers.shape == (227, 2)
        assert bw.shape == (227,)
        # first resolution: 5x5 grid, spacing 0.25, bw = 0.625
        assert np.isclose(bw[0], 2.5 / 4)
        # second: 9x9 grid -> bw = 2.5/8
        assert np.isclose(bw[25], 2.5 / 8)
        # grid covers [0,1]^2 inclusive
        assert np.isclose(centers[:25].min(), 0.0)
        assert np.isclose(centers[:25].max(), 1.0)

    def test_meshgrid_order_ij(self):
        # first 5 centers share x=0, varying y (indexing='ij')
        centers, _ = uniform_grid_centers([25])
        assert np.allclose(centers[:5, 0], 0.0)
        assert np.allclose(centers[:5, 1], np.linspace(0, 1, 5))

    def test_non_square_raises(self):
        with pytest.raises(ValueError):
            uniform_grid_centers([24])


class TestEmbeddings:
    def test_spatial_embed_against_cdist(self):
        rng = np.random.default_rng(0)
        coords = rng.uniform(size=(50, 2)).astype(np.float32)
        centers, bw = uniform_grid_centers([25, 81])
        phi = np.asarray(spatial_basis_embed(
            jnp.asarray(coords), jnp.asarray(centers), jnp.asarray(bw), "wendland"))
        # independent reference computation in numpy
        dist = np.sqrt(((coords[:, None, :] - centers[None]) ** 2).sum(-1))
        r = dist / bw[None]
        r = np.minimum(r, 1.0)
        expected = (1 - r) ** 6 * (35 * r**2 + 18 * r + 3) / 3
        assert np.allclose(phi, expected, atol=1e-5)
        assert phi.shape == (50, 106)

    def test_calibration_is_applied(self):
        coords = jnp.array([[0.5, 0.5]])
        centers = jnp.array([[0.5, 0.6]])
        bw = jnp.array([1.0])
        phi = spatial_basis_embed(coords, centers, bw, "gaussian")
        r_eff = 0.1 / (1.0 * CALIBRATION_FACTORS["gaussian"])
        assert np.isclose(float(phi[0, 0]), np.exp(-0.5 * r_eff**2), atol=1e-5)

    def test_temporal_embed(self):
        centers, bw = temporal_grid_centers([10, 15, 45])
        assert centers.shape == (70,)
        assert np.isclose(bw[0], 2.5 / 9)
        t = jnp.array([[0.0], [0.5], [1.0]])
        psi = np.asarray(temporal_basis_embed(jnp.asarray(t), jnp.asarray(centers),
                                              jnp.asarray(bw)))
        assert psi.shape == (3, 70)
        # at a center, value is exactly 1
        assert np.isclose(psi[0, 0], 1.0)
        expected = np.exp(-0.5 * ((0.5 - centers) / bw) ** 2)
        assert np.allclose(psi[1], expected, atol=1e-6)
