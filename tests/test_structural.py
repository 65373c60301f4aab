"""Structural time-series builders (BSTS-style composition into
LGSSParams): block structure, equivalence with hand-built params, and a
level+seasonal recovery/forecast oracle on synthetic data."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu.models.lgss import (
    autoregressive,
    forecast,
    kalman_filter,
    lgss_loglik,
    lgss_params,
    local_level,
    local_linear_trend,
    rts_smoother,
    seasonal,
    structural,
)


def test_local_level_equivalent_to_direct_params():
    rng = np.random.default_rng(0)
    ys = rng.standard_normal(30).astype(np.float32)
    p_s = structural([local_level(0.4)], sigma_obs=0.8, p0_scale=4.0)
    p_d = lgss_params(A=1.0, b=0.0, Q=0.16, H=1.0, c=0.0, R=0.64,
                      m0=0.0, P0=4.0)
    np.testing.assert_allclose(
        float(lgss_loglik(p_s, ys)), float(lgss_loglik(p_d, ys)),
        rtol=1e-5,
    )


def test_block_structure_and_shapes():
    p = structural(
        [local_linear_trend(0.3, 0.05), seasonal(4, 0.1),
         autoregressive(0.8, 0.2)],
        sigma_obs=0.5,
    )
    d = 2 + 3 + 1
    assert p.A.shape == (d, d) and p.Q.shape == (d, d)
    assert p.H.shape == (1, d)
    # off-diagonal blocks are zero (components evolve independently)
    A = np.asarray(p.A)
    assert np.all(A[:2, 2:] == 0) and np.all(A[2:, :2] == 0)
    assert np.all(A[2:5, 5:] == 0) and np.all(A[5:, 2:5] == 0)
    # seasonal transition: first row -1s, shifted identity below
    np.testing.assert_array_equal(A[2, 2:5], [-1, -1, -1])
    np.testing.assert_array_equal(A[3:5, 2:4], np.eye(2))
    with pytest.raises(ValueError, match="n_seasons"):
        seasonal(1)
    with pytest.raises(ValueError, match="component"):
        structural([], sigma_obs=1.0)


def test_seasonal_pattern_sums_to_zero_in_simulation():
    """Noise-free seasonal dynamics cycle with period S and sum to 0
    over any full period."""
    c = seasonal(4, sigma=0.0)
    x = np.asarray([1.0, -0.5, 0.3], np.float32)  # arbitrary start
    A = np.asarray(c.A)
    effects = []
    for _ in range(12):
        effects.append(x[0])
        x = A @ x
    effects = np.asarray(effects)
    np.testing.assert_allclose(
        effects.reshape(3, 4).sum(1), 0.0, atol=1e-5
    )
    np.testing.assert_allclose(effects[:4], effects[4:8], atol=1e-5)


def test_level_plus_seasonal_recovery_and_forecast():
    """Synthetic level+seasonal series: the smoother separates the two
    components and the forecast continues the seasonal pattern into a
    holdout window."""
    rng = np.random.default_rng(3)
    S, t_n, h = 4, 96, 8
    season_true = np.array([1.5, -0.5, -1.2, 0.2])
    level_true = np.cumsum(rng.normal(0, 0.15, t_n + h)) + 3.0
    t_idx = np.arange(t_n + h)
    y_full = (level_true + season_true[t_idx % S]
              + rng.normal(0, 0.3, t_n + h))
    ys = y_full[:t_n].astype(np.float32)

    p = structural(
        [local_level(0.15), seasonal(S, 0.01)],
        sigma_obs=0.3, p0_scale=25.0,
    )
    means, covs = rts_smoother(p, ys)
    means = np.asarray(means)
    # smoothed level tracks the true level
    rmse_level = np.sqrt(((means[:, 0] - level_true[:t_n]) ** 2)[8:].mean())
    assert rmse_level < 0.5, rmse_level
    # smoothed seasonal effect correlates with the true pattern
    seas_hat = means[:, 1]
    seas_true_t = season_true[np.arange(t_n) % S]
    c = np.corrcoef(seas_hat[8:], seas_true_t[8:])[0, 1]
    assert c > 0.9, c
    # forecasts continue the pattern into the holdout
    _, _, om, oP = forecast(p, ys, horizon=h)
    om = np.asarray(om)[:, 0]
    sd = np.sqrt(np.asarray(oP)[:, 0, 0])
    inside = np.abs(om - y_full[t_n:]) < 3.0 * sd
    assert inside.mean() >= 0.75, (om, y_full[t_n:], sd)
    # and the forecast's seasonal phase matches the truth
    cf = np.corrcoef(om - om.mean(),
                     season_true[np.arange(t_n, t_n + h) % S])[0, 1]
    assert cf > 0.7, cf


def test_structural_scales_are_differentiable():
    rng = np.random.default_rng(5)
    ys = rng.standard_normal(40).astype(np.float32)

    def nll(log_scales):
        p = structural(
            [local_linear_trend(jnp.exp(log_scales[0]),
                                jnp.exp(log_scales[1])),
             seasonal(3, jnp.exp(log_scales[2]))],
            sigma_obs=jnp.exp(log_scales[3]),
        )
        return -lgss_loglik(p, ys)

    g = jax.grad(nll)(jnp.zeros(4))
    assert np.isfinite(np.asarray(g)).all()
