"""Data-adaptive initializer tests (JAX GMM-EM / balanced k-means /
random-site vs reference semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from st_dadk_tpu.ops.basis import uniform_bandwidth_for
from st_dadk_tpu.ops.init_centers import (balanced_kmeans, gmm_spherical,
                                          init_spatial_centers,
                                          kmeans_plus_plus)


def _two_clusters(n=400, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal([0.25, 0.25], 0.05, size=(n // 2, 2))
    b = rng.normal([0.75, 0.75], 0.05, size=(n // 2, 2))
    return np.concatenate([a, b]).astype(np.float32)


class TestKmeansPP:
    def test_spread(self):
        X = jnp.asarray(_two_clusters())
        centers = np.asarray(kmeans_plus_plus(jax.random.PRNGKey(0), X, 2))
        # one seed per cluster (they are 0.7 apart, sigma 0.05)
        d = np.linalg.norm(centers[0] - centers[1])
        assert d > 0.3


class TestGMM:
    def test_recovers_two_clusters(self):
        X = jnp.asarray(_two_clusters())
        means, sigmas = gmm_spherical(jax.random.PRNGKey(1), X, 2,
                                      max_iter=50, n_init=3)
        means = np.asarray(means)
        sigmas = np.asarray(sigmas)
        got = sorted(means.sum(axis=1))
        assert abs(got[0] - 0.5) < 0.1 and abs(got[1] - 1.5) < 0.1
        assert np.all(sigmas > 0.02) and np.all(sigmas < 0.12)

    def test_finite_on_degenerate_data(self):
        # all points identical — variance clamps at reg_covar, no NaN
        X = jnp.ones((100, 2)) * 0.5
        means, sigmas = gmm_spherical(jax.random.PRNGKey(0), X, 3,
                                      max_iter=20, n_init=1)
        assert np.isfinite(np.asarray(means)).all()
        assert np.isfinite(np.asarray(sigmas)).all()


class TestBalancedKmeans:
    def test_balance(self):
        X = jnp.asarray(_two_clusters(600, 2))
        centers = np.asarray(balanced_kmeans(jax.random.PRNGKey(2), X, 4,
                                             max_iter=40))
        assert np.isfinite(centers).all()
        # occupancy is roughly balanced under plain nearest-center assignment
        d = ((np.asarray(X)[:, None] - centers[None]) ** 2).sum(-1)
        counts = np.bincount(d.argmin(1), minlength=4)
        assert counts.min() > 0.4 * 600 / 4
        assert counts.max() < 2.2 * 600 / 4


class TestDispatcher:
    def test_uniform(self):
        c, bw = init_spatial_centers("uniform", [25, 81])
        assert c.shape == (106, 2) and bw.shape == (106,)

    def test_gmm_bandwidth_floor(self):
        X = _two_clusters()
        c, bw = init_spatial_centers("gmm", [25], X,
                                     key=jax.random.PRNGKey(0))
        # bandwidth = 4.23*2.5*sigma clipped below 0.25 x uniform bw
        assert bw.min() >= 0.25 * uniform_bandwidth_for(25) - 1e-6
        assert c.shape == (25, 2)

    def test_random_site_draws_data_points(self):
        np.random.seed(0)
        X = _two_clusters()
        c, bw = init_spatial_centers("random_site", [9], X)
        # every center is an actual data coordinate
        for row in c:
            assert np.any(np.all(np.isclose(X, row, atol=1e-7), axis=1))
        assert np.all(bw > 0)

    def test_kmeans_balanced_shapes(self):
        np.random.seed(0)
        X = _two_clusters()
        c, bw = init_spatial_centers("kmeans_balanced", [9, 16], X,
                                     key=jax.random.PRNGKey(3))
        assert c.shape == (25, 2) and bw.shape == (25,)
        assert np.all(bw > 0)

    def test_requires_coords(self):
        with pytest.raises(ValueError):
            init_spatial_centers("gmm", [9], None)
        with pytest.raises(ValueError):
            init_spatial_centers("voronoi", [9], _two_clusters())
