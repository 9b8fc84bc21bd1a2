"""Forecasting-workload consumer: window flattening + multi-horizon
forecaster training on a synthetic AR field (the reference carries the
KAUSTWindowDataset style without a trainer; here it is end-to-end)."""
import jax
import numpy as np

from st_dadk_tpu.dataio.windows import (build_window_dataset,
                                        prepare_test_context,
                                        train_valid_window_split)
from st_dadk_tpu.models.forecaster import (ForecastSpec, ForecastData,
                                           fit_forecaster, forward_forecaster,
                                           init_forecaster, rows_from_windows)


def _ar_field(T=80, S=30, phi=0.9, noise=0.1, seed=0):
    """Strongly autocorrelated field: history is genuinely predictive."""
    rng = np.random.default_rng(seed)
    coords = rng.uniform(size=(S, 2)).astype(np.float32)
    base = np.sin(4 * coords[:, 0]) + np.cos(3 * coords[:, 1])
    z = np.empty((T, S), np.float32)
    z[0] = base + rng.normal(0, 0.3, S)
    for t in range(1, T):
        z[t] = base + phi * (z[t - 1] - base) + rng.normal(0, noise, S)
    return z, coords


class TestRowsFromWindows:
    def test_shapes_and_alignment(self):
        z, coords = _ar_field()
        ds = build_window_dataset(z, coords, np.arange(30), L=5, H=3)
        rows = rows_from_windows(ds, 80)
        W = len(ds)
        assert rows.y_hist.shape == (W * 30, 5)
        assert rows.y_fut.shape == (W * 30, 3)
        assert rows.coords.shape == (W * 30, 2)
        # first window, first site: history = z[t0-5:t0, site0]
        t0 = ds.t0[0]
        np.testing.assert_allclose(rows.y_hist[0], z[t0 - 5:t0, 0])
        np.testing.assert_allclose(rows.y_fut[0], z[t0:t0 + 3, 0])
        # second sample is the SAME window, next site
        np.testing.assert_allclose(rows.y_hist[1], z[t0 - 5:t0, 1])


class TestForecasterTraining:
    def test_beats_persistence_on_ar_field(self):
        # noisy AR: copying the last value copies the noise, while
        # averaging the history filters it — a forecaster must win here
        z, coords = _ar_field(T=80, S=30, phi=0.8, noise=0.35)
        obs = np.arange(30)
        spec = ForecastSpec(L=8, H=3, k_spatial_centers=(9,),
                            k_temporal_centers=(4,), hidden_dims=(64, 32),
                            dropout=0.0)
        tr, va = train_valid_window_split(z, coords, obs, spec.L, spec.H,
                                          val_ratio=0.2)
        tr_rows = rows_from_windows(tr, 80)
        va_rows = rows_from_windows(va, 80)
        params, consts = init_forecaster(jax.random.PRNGKey(0), spec)
        best_p, hist = fit_forecaster(spec, params, consts, tr_rows, va_rows,
                                      epochs=250, batch_size=256, lr=3e-3,
                                      patience=60, seed=0)
        assert np.isfinite(hist["best_val"])

        preds = np.asarray(forward_forecaster(spec, best_p, consts,
                                              va_rows.y_hist, va_rows.coords,
                                              va_rows.t0))
        mse = float(np.mean((preds - va_rows.y_fut) ** 2))
        persistence = np.repeat(va_rows.y_hist[:, -1:], spec.H, axis=1)
        mse_p = float(np.mean((persistence - va_rows.y_fut) ** 2))
        assert mse < mse_p, (mse, mse_p)

    def test_test_context_forecast_shapes(self):
        z, coords = _ar_field(T=60, S=20)
        obs = np.arange(20)
        spec = ForecastSpec(L=6, H=4, k_spatial_centers=(9,),
                            k_temporal_centers=(4,), hidden_dims=(16,),
                            dropout=0.0)
        params, consts = init_forecaster(jax.random.PRNGKey(1), spec)
        ctx = prepare_test_context(z, coords, obs, spec.L)
        y_hist = ctx["y_hist_obs"][0, :, :, 0].T
        t0 = np.full((20, 1), 1.0, np.float32)
        preds = np.asarray(forward_forecaster(spec, params, consts,
                                              y_hist.astype(np.float32),
                                              ctx["obs_coords"][0], t0))
        assert preds.shape == (20, 4)
        assert np.isfinite(preds).all()
