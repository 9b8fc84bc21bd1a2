"""Data-layer tests: ingest, observation design (incl. seed-exactness vs an
independent replay), point buffers, windows. Real-data tests skip when the
KAUST CSVs are absent (mirroring the reference's gated integration tier)."""
import numpy as np
import pytest

from st_dadk_tpu.dataio.arrays import (dense_grid_points, pad_pointset,
                                       pointset_from_mask)
from st_dadk_tpu.dataio.obs_design import (sample_observations,
                                           spatial_obs_probs,
                                           split_train_valid)
from st_dadk_tpu.dataio.windows import (build_window_dataset,
                                        prepare_test_context,
                                        train_valid_window_split)


def _toy(T=10, S=20, seed=0):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(size=(S, 2)).astype(np.float32)
    z = rng.normal(size=(T, S)).astype(np.float32)
    return z, coords


class TestObsDesign:
    def test_corner_probs(self):
        coords = np.array([[0.0, 0.0], [1.0, 1.0]])
        p = spatial_obs_probs(coords, "corner", intensity=10.0)
        assert p[0] == 1.0
        assert np.isclose(p[1], 1.0 / 21.0 ** 2)
        assert spatial_obs_probs(coords, "uniform") is None
        with pytest.raises(ValueError):
            spatial_obs_probs(coords, "edge")

    def test_site_wise_mask(self):
        z, coords = _toy()
        mask, sites = sample_observations(z, coords, "site-wise", 0.3,
                                          seed=11)
        assert mask.shape == z.shape
        assert len(sites) == int(20 * 0.3)
        # site-wise: a site is observed at all times or never
        per_site = mask.sum(axis=0)
        assert set(np.unique(per_site)) <= {0, 10}

    def test_random_mask_rate(self):
        z, coords = _toy(T=200, S=100)
        mask, sites = sample_observations(z, coords, "random", 0.25, seed=3)
        assert abs(mask.mean() - 0.25) < 0.02

    def test_seed_exactness_site_wise(self):
        """The masks must be bit-identical to an independent numpy replay of
        the reference's RNG call sequence (train_st_interp.py:282-342)."""
        z, coords = _toy(T=7, S=50, seed=5)
        w = spatial_obs_probs(coords, "corner", 10.0)
        mask, sites = sample_observations(z, coords, "site-wise", 0.2, w,
                                          seed=123)
        # independent replay
        np.random.seed(123)
        probs = np.clip(w / w.mean() * 0.2, 0, 1)
        expect_sites = np.random.choice(50, size=10, replace=False,
                                        p=probs / probs.sum())
        assert np.array_equal(np.sort(sites), np.sort(expect_sites))
        expect_mask = np.zeros((7, 50), bool)
        expect_mask[:, expect_sites] = True
        assert np.array_equal(mask, expect_mask)

    def test_seed_exactness_random(self):
        z, coords = _toy(T=7, S=50, seed=5)
        mask, _ = sample_observations(z, coords, "random", 0.3, None, seed=9)
        np.random.seed(9)
        expect = np.random.rand(7, 50) < np.full((7, 50), 0.3)
        assert np.array_equal(mask, expect)

    def test_split_partition(self):
        z, coords = _toy()
        mask, sites = sample_observations(z, coords, "site-wise", 0.5, seed=1)
        for method in ("site-wise", "random"):
            tr, va = split_train_valid(mask, sites, method, 0.8, seed=2)
            assert not (tr & va).any()
            assert ((tr | va) == mask).all()
            ratio = tr.sum() / mask.sum()
            assert 0.7 <= ratio <= 0.9


class TestPointSet:
    def test_from_mask_skips_nan(self):
        z, coords = _toy(T=3, S=4)
        z[0, 0] = np.nan
        mask = np.ones((3, 4), bool)
        ps = pointset_from_mask(z, coords, mask)
        assert ps.n_real == 11
        assert np.isfinite(ps.y).all()
        # time normalized t/(T-1)
        assert set(np.unique(ps.t)) <= {0.0, 0.5, 1.0}

    def test_pad(self):
        z, coords = _toy(T=2, S=3)
        ps = pointset_from_mask(z, coords, np.ones((2, 3), bool))
        padded = pad_pointset(ps, 10)
        assert len(padded) == 10
        assert padded.w.sum() == 6
        with pytest.raises(ValueError):
            pad_pointset(ps, 2)

    def test_dense_grid_layout(self):
        coords = np.array([[0.1, 0.2], [0.3, 0.4]], np.float32)
        c, t = dense_grid_points(3, coords)
        assert c.shape == (6, 2) and t.shape == (6, 1)
        # row-major (t, s): first two rows are t=0 at both sites
        assert np.allclose(t[:2], 0.0) and np.allclose(t[2:4], 0.5)
        assert np.allclose(c[0], coords[0]) and np.allclose(c[1], coords[1])


class TestWindows:
    def test_shapes_and_alignment(self):
        z, coords = _toy(T=30, S=10)
        obs = np.arange(6)
        ds = build_window_dataset(z, coords, obs, L=5, H=3)
        W = len(ds)
        assert ds.y_hist.shape == (W, 5, 6, 1)
        assert ds.y_fut.shape == (W, 3, 6, 1)
        # window w: hist covers [t0-L, t0), future [t0, t0+H)
        w0 = 0
        t0 = ds.t0[w0]
        assert np.allclose(ds.y_hist[w0, :, :, 0], z[t0 - 5:t0][:, obs])
        assert np.allclose(ds.y_fut[w0, :, :, 0], z[t0:t0 + 3][:, obs])

    def test_covariates(self):
        z, coords = _toy(T=30, S=10)
        obs = np.arange(4)
        ds = build_window_dataset(z, coords, obs, L=4, H=2,
                                  use_coords_cov=True, use_time_cov=True,
                                  time_encoding="sinusoidal")
        assert ds.p_covariates == 4  # (x, y, sin, cos)
        assert ds.X_hist.shape[-1] == 4
        assert ds.X_fut.shape[-1] == 4

    def test_target_time_split(self):
        z, coords = _toy(T=90, S=8)
        obs = np.arange(5)
        tr, va = train_valid_window_split(z, coords, obs, L=24, H=10,
                                          val_ratio=0.2)
        # no target-time overlap between train and valid windows
        assert tr.t0.max() < va.t0.min()
        assert va.t0.max() <= 90 - 10

    def test_test_context(self):
        z, coords = _toy(T=30, S=10)
        obs = np.arange(6)
        ctx = prepare_test_context(z, coords, obs, L=7)
        assert ctx["y_hist_obs"].shape == (1, 7, 6, 1)
        assert ctx["target_coords"].shape == (1, 10, 2)


class TestRealData:
    def test_load_2a8(self, ref_data_root):
        from st_dadk_tpu.dataio.kaust import load_kaust_csv_single
        path = ref_data_root / "2a" / "2a_8.csv"
        z, coords, meta = load_kaust_csv_single(path, normalize=False,
                                                verbose=False)
        assert z.shape == (100, 1000)
        assert coords.shape == (1000, 2)
        assert coords.min() >= 0.0 and coords.max() <= 1.0
        assert np.isfinite(z).all()

    def test_load_normalization(self, ref_data_root):
        from st_dadk_tpu.dataio.kaust import load_kaust_csv_single
        path = ref_data_root / "2a" / "2a_8.csv"
        z, _, meta = load_kaust_csv_single(path, normalize=True, verbose=False)
        assert abs(float(np.nanmean(z))) < 1e-4
        assert abs(float(np.nanstd(z)) - 1.0) < 1e-4
        assert "z_mean" in meta and "z_std" in meta

    def test_normalize_zless_file_keeps_identity_stats(self, tmp_path):
        """normalize=True on a z-less CSV (the *_test.csv layout) must keep
        the 0/1 identity stats instead of NaN-poisoning metadata
        (regression: mean/std of the empty observed slice)."""
        from st_dadk_tpu.dataio.kaust import load_kaust_csv_single
        path = tmp_path / "zless.csv"
        path.write_text("x,y,t\n0.1,0.2,1\n0.3,0.4,2\n")
        z, coords, meta = load_kaust_csv_single(path, normalize=True,
                                                verbose=False)
        assert np.isnan(z).all() and coords.shape == (2, 2)
        assert meta["z_mean"] == 0.0 and meta["z_std"] == 1.0

    def test_spatial_only_1a(self, ref_data_root):
        from st_dadk_tpu.dataio.kaust import load_kaust_csv_single
        path = ref_data_root / "1a" / "1a_1_train.csv"
        if not path.exists():
            pytest.skip("1a data absent")
        z, coords, meta = load_kaust_csv_single(path, normalize=False,
                                                verbose=False)
        assert z.shape[0] == 1  # T=1 spatial-only extension
        assert coords.shape[0] == z.shape[1]

    def test_train_test_pair(self, ref_data_root):
        from st_dadk_tpu.dataio.kaust import load_kaust_csv
        tr = ref_data_root / "2a" / "2a_8_train.csv"
        te = ref_data_root / "2a" / "2a_8_test.csv"
        if not (tr.exists() and te.exists()):
            pytest.skip("2a_8 train/test pair absent")
        z_train, z_test, coords, site_to_idx, meta = load_kaust_csv(
            tr, te, normalize=True, verbose=False)
        assert z_train.shape[1] == coords.shape[0]
        assert np.isnan(z_test).all()
        assert len(site_to_idx) == coords.shape[0]
