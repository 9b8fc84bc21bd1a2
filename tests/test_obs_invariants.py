"""Property-style invariant sweep over the observation-design samplers
(roadmap hardening item): partition invariants, ratio bounds, seed
determinism, and weighting direction — checked across a grid of shapes,
ratios, methods, patterns, and seeds rather than single hand-picked cases."""
import itertools

import numpy as np
import pytest

from st_dadk_tpu.dataio.obs_design import (sample_observations,
                                           spatial_obs_probs,
                                           split_train_valid)

SHAPES = [(5, 40), (20, 100), (100, 30)]
RATIOS = [0.1, 0.5, 0.9]
SEEDS = [0, 7]


def _coords(S, seed=0):
    return np.random.default_rng(seed).uniform(size=(S, 2))


@pytest.mark.parametrize("shape,ratio,method,pattern,seed", [
    c for c in itertools.product(SHAPES, RATIOS, ("site-wise", "random"),
                                 ("uniform", "corner"), SEEDS)])
def test_mask_invariants(shape, ratio, method, pattern, seed):
    T, S = shape
    z = np.zeros(shape)
    coords = _coords(S)
    w = spatial_obs_probs(coords, pattern, intensity=10.0)

    obs_mask, obs_sites = sample_observations(z, coords, method, ratio, w,
                                              seed=seed)
    assert obs_mask.shape == shape and obs_mask.dtype == bool
    # obs_sites are exactly the sites with at least one observation
    np.testing.assert_array_equal(np.where(obs_mask.any(axis=0))[0],
                                  np.sort(np.unique(obs_sites)))

    if method == "site-wise":
        # exactly floor(S * ratio) sites, all fully observed in time
        assert len(obs_sites) == int(S * ratio)
        assert obs_mask.sum() == int(S * ratio) * T
        assert (obs_mask.sum(axis=0)[obs_sites] == T).all()
    else:
        # Bernoulli per cell: observed fraction within 6 sigma of the
        # clipped per-site probabilities' mean
        if w is not None:
            p = np.clip(w / w.mean() * ratio, 0, 1)
        else:
            p = np.full(S, ratio)
        expect = p.mean()
        sigma = np.sqrt(np.sum(p * (1 - p)) * T) / (T * S)
        assert abs(obs_mask.mean() - expect) < max(6 * sigma, 1e-9)

    # determinism: same seed -> identical masks
    again, _ = sample_observations(z, coords, method, ratio, w, seed=seed)
    np.testing.assert_array_equal(again, obs_mask)

    for split in ("site-wise", "random"):
        tr, va = split_train_valid(obs_mask, obs_sites, split,
                                   train_ratio=0.8, seed=seed + 10000)
        # train/valid are a disjoint partition of the observed cells
        assert not (tr & va).any()
        np.testing.assert_array_equal(tr | va, obs_mask)
        if split == "random" and obs_mask.sum() > 0:
            assert tr.sum() == int(obs_mask.sum() * 0.8)
        if split == "site-wise" and len(obs_sites) > 0:
            tr_sites = set(np.where(tr.any(axis=0))[0])
            va_sites = set(np.where(va.any(axis=0))[0])
            assert not (tr_sites & va_sites)
            assert len(tr_sites) == int(len(obs_sites) * 0.8)


def test_corner_pattern_biases_toward_origin():
    coords = _coords(400, seed=1)
    w = spatial_obs_probs(coords, "corner", intensity=10.0)
    near = np.linalg.norm(coords, axis=1) < 0.4
    assert w[near].mean() > 3 * w[~near].mean()

    # site-wise selection under the corner weights oversamples the corner
    counts = np.zeros(400)
    for seed in range(30):
        _, sites = sample_observations(np.zeros((3, 400)), coords,
                                       "site-wise", 0.2, w, seed=seed)
        counts[sites] += 1
    assert counts[near].mean() > 2 * counts[~near].mean()


def test_test_set_is_complement():
    z = np.zeros((10, 50))
    coords = _coords(50)
    obs_mask, sites = sample_observations(z, coords, "site-wise", 0.4,
                                          None, seed=3)
    test_mask = ~obs_mask
    assert (obs_mask.sum() + test_mask.sum()) == 10 * 50
