"""Loss / penalty / CRPS unit tests with hand-computed values.

Mirrors the reference's pure-math test tier
(tests/stnf/models/test_crps_eq_4_6.py, test_p_nc_delta_penalty.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from st_dadk_tpu.ops.losses import (
    check_loss_np,
    compute_crps,
    compute_crps_multi_quantile,
    mse_loss,
    multi_quantile_loss,
    non_crossing_penalty,
    p_nc_delta_penalty,
    quantile_loss,
)


class TestQuantileLoss:
    def test_hand_values(self):
        y_true = jnp.array([1.0, 2.0, 3.0])
        y_pred = jnp.array([0.5, 2.5, 3.0])
        # errors = [0.5, -0.5, 0]; tau=0.9:
        # rho = [0.9*0.5, 0.1*0.5, 0] -> mean = (0.45+0.05)/3
        got = float(quantile_loss(y_pred, y_true, 0.9))
        assert np.isclose(got, 0.5 / 3, atol=1e-6)

    def test_median_is_half_mae(self):
        rng = np.random.default_rng(1)
        y_true = jnp.asarray(rng.normal(size=100))
        y_pred = jnp.asarray(rng.normal(size=100))
        rho = float(quantile_loss(y_pred, y_true, 0.5))
        mae = float(jnp.mean(jnp.abs(y_true - y_pred)))
        assert np.isclose(rho, 0.5 * mae, atol=1e-6)

    def test_weighted_equals_subset(self):
        rng = np.random.default_rng(2)
        y_true = jnp.asarray(rng.normal(size=(64, 1)).astype(np.float32))
        y_pred = jnp.asarray(rng.normal(size=(64, 1)).astype(np.float32))
        w = jnp.asarray((rng.uniform(size=64) < 0.7).astype(np.float32))
        got = float(quantile_loss(y_pred, y_true, 0.25, weights=w))
        keep = np.asarray(w) > 0
        want = float(quantile_loss(y_pred[keep], y_true[keep], 0.25))
        assert np.isclose(got, want, atol=1e-6)


class TestMultiQuantileLoss:
    def test_equals_mean_of_per_quantile(self):
        rng = np.random.default_rng(3)
        q_levels = jnp.array([0.05, 0.25, 0.5, 0.75, 0.95])
        y_true = jnp.asarray(rng.normal(size=(32, 1)).astype(np.float32))
        y_pred = jnp.asarray(rng.normal(size=(32, 5)).astype(np.float32))
        got = float(multi_quantile_loss(y_pred, y_true, q_levels))
        want = np.mean([float(quantile_loss(y_pred[:, i:i+1], y_true, float(q)))
                        for i, q in enumerate(np.asarray(q_levels))])
        assert np.isclose(got, want, atol=1e-6)

    def test_weighted(self):
        rng = np.random.default_rng(4)
        q_levels = jnp.array([0.1, 0.5, 0.9])
        y_true = jnp.asarray(rng.normal(size=(16, 1)).astype(np.float32))
        y_pred = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        w = jnp.asarray((rng.uniform(size=16) < 0.5).astype(np.float32))
        keep = np.asarray(w) > 0
        got = float(multi_quantile_loss(y_pred, y_true, q_levels, weights=w))
        want = float(multi_quantile_loss(y_pred[keep], y_true[keep], q_levels))
        assert np.isclose(got, want, atol=1e-6)


class TestNonCrossingPenalty:
    def test_zero_when_sorted(self):
        y = jnp.array([[1.0, 2.0, 3.0], [0.0, 0.5, 0.6]])
        assert float(non_crossing_penalty(y)) == 0.0

    def test_hand_value(self):
        # crossing: q1=2 > q2=1 -> violation 1; q2=1 < q3=3 -> 0
        y = jnp.array([[2.0, 1.0, 3.0]])
        assert np.isclose(float(non_crossing_penalty(y, power=1)), 1.0)
        assert np.isclose(float(non_crossing_penalty(y, power=2)), 1.0)
        y2 = jnp.array([[2.0, 0.5, 3.0]])
        assert np.isclose(float(non_crossing_penalty(y2, power=2)), 2.25)

    def test_reductions(self):
        y = jnp.array([[2.0, 1.0], [3.0, 1.0]])  # violations 1 and 2
        assert np.isclose(float(non_crossing_penalty(y, "mean")), 1.5)
        assert np.isclose(float(non_crossing_penalty(y, "sum")), 3.0)
        with pytest.raises(ValueError):
            non_crossing_penalty(y, "max")
        with pytest.raises(ValueError):
            non_crossing_penalty(y, power=3)

    def test_single_quantile_is_zero(self):
        assert float(non_crossing_penalty(jnp.ones((4, 1)))) == 0.0


class TestPncDelta:
    def test_hand_value(self):
        # Q=2, d=2. delta_2 = [1.0, -0.5, 2.0]
        # sum_neg = max(0,0.5) + max(0,-2) = 0.5; J = 1.0 - max(1.0, 0.5) = 0
        delta = jnp.array([[0.0, 0.0, 0.0], [1.0, -0.5, 2.0]])
        assert np.isclose(float(p_nc_delta_penalty(delta)), 0.0)
        # delta_2 = [-1.0, -0.5, -2.0]: sum_neg = 2.5; J = -1 - 2.5 = -3.5
        delta = jnp.array([[0.0, 0.0, 0.0], [-1.0, -0.5, -2.0]])
        assert np.isclose(float(p_nc_delta_penalty(delta)), -3.5)

    def test_multi_row_sum(self):
        delta = jnp.array([
            [9.0, 9.0],      # k=1 row never penalized
            [-1.0, -2.0],    # J = -1 - max(-1, 2) = -3
            [0.5, 1.0],      # J = 0.5 - max(0.5, 0) = 0
        ])
        assert np.isclose(float(p_nc_delta_penalty(delta)), -3.0)

    def test_always_nonpositive(self):
        rng = np.random.default_rng(5)
        for _ in range(20):
            delta = jnp.asarray(rng.normal(size=(5, 11)).astype(np.float32))
            assert float(p_nc_delta_penalty(delta)) <= 1e-7

    def test_none_and_single(self):
        assert float(p_nc_delta_penalty(None)) == 0.0
        assert float(p_nc_delta_penalty(jnp.ones((1, 4)))) == 0.0

    def test_gradient_first_row_zero(self):
        delta = jnp.asarray(np.random.default_rng(6).normal(size=(3, 4)),
                            dtype=jnp.float32)
        g = jax.grad(lambda d: p_nc_delta_penalty(d))(delta)
        assert np.allclose(np.asarray(g[0]), 0.0)


class TestCRPS:
    def test_identity_two_times_weighted_sum(self):
        rng = np.random.default_rng(7)
        y = rng.normal(size=200)
        preds = {q: rng.normal(size=200) for q in [0.05, 0.25, 0.5, 0.75, 0.95]}
        crps = compute_crps(preds, y)
        manual = 2.0 * np.mean([check_loss_np(preds[q], y, q) for q in sorted(preds)])
        assert np.isclose(crps, manual, atol=1e-10)

    def test_single_quantile(self):
        y = np.array([1.0, 2.0])
        preds = {0.5: np.array([0.0, 2.0])}
        # check loss = mean([0.5*1, 0]) = 0.25; CRPS = 0.5
        assert np.isclose(compute_crps(preds, y), 0.5)

    def test_custom_weights_normalized(self):
        y = np.random.default_rng(8).normal(size=50)
        preds = {0.25: y + 0.1, 0.75: y - 0.1}
        w1 = compute_crps(preds, y, weights=[1.0, 1.0])
        w2 = compute_crps(preds, y, weights=[10.0, 10.0])
        assert np.isclose(w1, w2)

    def test_errors(self):
        with pytest.raises(ValueError):
            compute_crps({}, np.zeros(3))
        with pytest.raises(ValueError):
            compute_crps({0.1: np.zeros(3), 0.9: np.zeros(3)}, np.zeros(3),
                         weights=[1.0])

    def test_matrix_wrapper(self):
        rng = np.random.default_rng(9)
        y = rng.normal(size=(30, 1))
        preds = rng.normal(size=(30, 3))
        qs = [0.1, 0.5, 0.9]
        got = compute_crps_multi_quantile(preds, y, qs)
        want = compute_crps({q: preds[:, i] for i, q in enumerate(qs)},
                            y.ravel())
        assert np.isclose(got, want)


class TestMSE:
    def test_weighted(self):
        y_true = jnp.array([[1.0], [2.0], [3.0]])
        y_pred = jnp.array([[1.0], [0.0], [5.0]])
        w = jnp.array([1.0, 1.0, 0.0])
        assert np.isclose(float(mse_loss(y_pred, y_true, w)), 2.0)
