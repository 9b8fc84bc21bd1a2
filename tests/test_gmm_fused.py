"""Fused multi-resolution GMM EM (gmm_spherical_multi) correctness.

The fused program merges all basis resolutions' EMs along the component
axis (one while_loop, zero padding) with per-resolution tol freeze. With
tol=0 neither program ever converges early, so both run exactly max_iter
iterations with identical seeding — results must match the sequential
per-resolution EMs to float tolerance. With the default tol the freeze
semantics differ (sequential locksteps restarts; fused stops each
(resolution, restart) at its own tol, sklearn-style) so only closeness is
asserted there.
"""
import jax
import jax.numpy as jnp
import numpy as np

from st_dadk_tpu.ops.init_centers import (gmm_spherical, gmm_spherical_multi,
                                          init_spatial_centers,
                                          init_spatial_centers_batch)


def _blobs(n=400, seed=0):
    rng = np.random.default_rng(seed)
    cs = rng.uniform(0, 1, (6, 2))
    pts = cs[rng.integers(0, 6, n)] + rng.normal(0, 0.04, (n, 2))
    return jnp.asarray(pts, jnp.float32)


class TestFusedMatchesSequential:
    def test_tol0_exact_iteration_parity(self):
        X = _blobs()
        key = jax.random.PRNGKey(7)
        ks = (5, 9)
        kres = jnp.stack([jax.random.fold_in(key, i) for i in range(len(ks))])
        fused = gmm_spherical_multi(kres, X, ks=ks, max_iter=12, tol=0.0,
                                    n_init=2)
        for r, k in enumerate(ks):
            means_s, sig_s = gmm_spherical(jax.random.fold_in(key, r), X, k,
                                           max_iter=12, tol=0.0, n_init=2)
            np.testing.assert_allclose(np.asarray(fused[r][0]),
                                       np.asarray(means_s), atol=2e-4)
            np.testing.assert_allclose(np.asarray(fused[r][1]),
                                       np.asarray(sig_s), rtol=2e-3)

    def test_default_tol_close(self):
        X = _blobs(seed=3)
        key = jax.random.PRNGKey(11)
        ks = (4, 8, 12)
        kres = jnp.stack([jax.random.fold_in(key, i) for i in range(len(ks))])
        fused = gmm_spherical_multi(kres, X, ks=ks, n_init=3)
        for r, k in enumerate(ks):
            means_s, sig_s = gmm_spherical(jax.random.fold_in(key, r), X, k,
                                           n_init=3)
            assert fused[r][0].shape == (k, 2)
            assert np.all(np.isfinite(np.asarray(fused[r][0])))
            # same seeding, tol-level EM drift only: centers within a small
            # fraction of the data scale of the sequential solution
            d = np.linalg.norm(np.asarray(fused[r][0])
                               - np.asarray(means_s), axis=1)
            assert np.median(d) < 0.05, d

    def test_weighted_padding_invariance(self):
        X = _blobs(n=300, seed=5)
        key = jax.random.PRNGKey(2)
        ks = (4, 6)
        kres = jnp.stack([jax.random.fold_in(key, i) for i in range(len(ks))])
        pad = jnp.concatenate([X, jnp.zeros((40, 2), jnp.float32)], 0)
        w = jnp.concatenate([jnp.ones((300,)), jnp.zeros((40,))])
        a = gmm_spherical_multi(kres, X, ks=ks, max_iter=10, tol=0.0,
                                n_init=1, w=jnp.ones((300,)))
        b = gmm_spherical_multi(kres, pad, ks=ks, max_iter=10, tol=0.0,
                                n_init=1, w=w)
        for r in range(len(ks)):
            np.testing.assert_allclose(np.asarray(a[r][0]),
                                       np.asarray(b[r][0]), atol=1e-4)


class TestKnobPlumbing:
    def test_init_spatial_centers_fused_path(self):
        coords = np.asarray(_blobs(500, seed=9))
        c0, b0 = init_spatial_centers("gmm", [4, 9], coords,
                                      key=jax.random.PRNGKey(1))
        c1, b1 = init_spatial_centers("gmm", [4, 9], coords,
                                      key=jax.random.PRNGKey(1),
                                      gmm_fused=True)
        assert c1.shape == c0.shape and b1.shape == b0.shape
        assert np.all(np.isfinite(c1)) and np.all(b1 > 0)
        d = np.linalg.norm(c1 - c0, axis=1)
        assert np.median(d) < 0.05

    def test_batch_fused_matches_batch_sequential_shapes(self):
        keys = jnp.stack([jax.random.PRNGKey(s) for s in (1, 2, 3)])
        coords = [np.asarray(_blobs(350, seed=s)) for s in (1, 2, 3)]
        cb0, bw0 = init_spatial_centers_batch("gmm", [4, 9], coords, keys,
                                              device_out=True)
        cb1, bw1 = init_spatial_centers_batch("gmm", [4, 9], coords, keys,
                                              device_out=True, gmm_fused=True)
        assert cb1.shape == cb0.shape and bw1.shape == bw0.shape
        assert np.all(np.isfinite(np.asarray(cb1)))
        assert np.all(np.asarray(bw1) > 0)
