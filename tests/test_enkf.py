"""Ensemble Kalman filter oracles.

Strategy (SURVEY.md §4 pattern): on a linear-Gaussian model the
stochastic EnKF converges to the EXACT Kalman filter as N grows —
filtered means, ensemble spread, and the Gaussian predictive loglik all
have exact truths from models/lgss. A nonlinear smoke test covers the
regime the exact tools can't reach, and a high-dimensional run checks
the (D, D)-free scaling claim. Fixed seeds, generous MC tolerances.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu import EnKFModel, ensemble_kalman_filter
from mcmcpp_tpu.models.lgss import kalman_filter, lgss_loglik, lgss_params

SIG_Q, SIG_R, M0, P0 = 0.35, 0.6, 1.0, 2.0


def _linear_model():
    return EnKFModel(
        init_sample=lambda k, n: M0 + jnp.sqrt(P0) * jax.random.normal(
            k, (n, 1)
        ),
        trans_sample=lambda k, x, t: x + SIG_Q * jax.random.normal(
            k, x.shape
        ),
        obs_fn=lambda x, t: x,
        obs_cov=jnp.asarray([[SIG_R ** 2]], jnp.float32),
    )


def _data(t_n, seed=0):
    rng = np.random.default_rng(seed)
    x = np.empty(t_n)
    x[0] = M0 + np.sqrt(P0) * rng.standard_normal()
    for t in range(1, t_n):
        x[t] = x[t - 1] + SIG_Q * rng.standard_normal()
    return x, (x + SIG_R * rng.standard_normal(t_n)).astype(np.float32)


def _lgss():
    return lgss_params(A=1.0, b=0.0, Q=SIG_Q**2, H=1.0, c=0.0,
                       R=SIG_R**2, m0=M0, P0=P0)


def test_linear_gaussian_converges_to_kalman():
    """N=8192 linear case: means within MC error of the exact filter,
    spread matching the exact posterior sd, loglik at the exact
    evidence (the EnKF's O(1/N) bias is inside the tolerance)."""
    t_n = 40
    _, ys = _data(t_n, seed=3)
    f = kalman_filter(_lgss(), ys)
    m_true = np.asarray(f.means)[:, 0]
    sd_true = np.sqrt(np.asarray(f.covs)[:, 0, 0])
    exact_ll = float(lgss_loglik(_lgss(), ys))

    res = ensemble_kalman_filter(jax.random.key(0), _linear_model(), ys,
                                 8192)
    err = np.abs(np.asarray(res.means)[:, 0] - m_true)
    assert (err < 6.0 * sd_true / np.sqrt(8192.0) + 0.02).all(), err.max()
    np.testing.assert_allclose(np.asarray(res.spread)[:, 0], sd_true,
                               rtol=0.15, atol=0.02)
    assert abs(float(res.loglik) - exact_ll) < 0.5, (
        float(res.loglik), exact_ll,
    )
    assert res.ensemble.shape == (8192, 1)


def test_small_ensemble_benefits_from_inflation():
    """Tiny N underestimates spread (sampling error -> overconfident
    gain); inflation must recover calibration: the inflated filter's
    state-tracking error normalized by its own spread is closer to 1."""
    t_n = 60
    x_true, ys = _data(t_n, seed=9)

    def zscore(infl):
        res = ensemble_kalman_filter(
            jax.random.key(4), _linear_model(), ys, 10, inflation=infl
        )
        z = (np.asarray(res.means)[:, 0] - x_true) / np.maximum(
            np.asarray(res.spread)[:, 0], 1e-6
        )
        return float(np.sqrt(np.mean(z[10:] ** 2)))

    z_plain, z_infl = zscore(1.0), zscore(1.08)
    assert abs(np.log(z_infl)) < abs(np.log(z_plain)) + 0.15, (
        z_plain, z_infl,
    )


def test_nonlinear_smoke_tracks_state():
    """Nonlinear forecast (stochastic sine map) + quadratic-free obs:
    finite loglik and the analysis mean tracks the simulated truth."""
    t_n, sig = 80, 0.15
    rng = np.random.default_rng(5)
    x = np.empty(t_n)
    x[0] = 0.5
    for t in range(1, t_n):
        x[t] = x[t - 1] + 0.5 * np.sin(x[t - 1]) + sig * \
            rng.standard_normal()
    ys = (x + 0.3 * rng.standard_normal(t_n)).astype(np.float32)

    model = EnKFModel(
        init_sample=lambda k, n: jax.random.normal(k, (n, 1)),
        trans_sample=lambda k, z, t: z + 0.5 * jnp.sin(z)
        + sig * jax.random.normal(k, z.shape),
        obs_fn=lambda z, t: z,
        obs_cov=jnp.asarray([[0.09]], jnp.float32),
    )
    res = ensemble_kalman_filter(jax.random.key(1), model, ys, 256)
    assert np.isfinite(float(res.loglik))
    rmse = float(np.sqrt(np.mean(
        (np.asarray(res.means)[10:, 0] - x[10:]) ** 2
    )))
    assert rmse < 0.3, rmse  # below the raw observation noise


def test_high_dimensional_scaling_no_dxd_covariance():
    """D=512 with N=64 members and E=32 partial observations: the
    (D, D) covariance is never formed, so this must run fast and stay
    finite — the shape regime particle filters cannot touch."""
    d, e, t_n, n = 512, 32, 20, 64
    rng = np.random.default_rng(2)
    h_rows = rng.choice(d, size=e, replace=False)
    ys = rng.standard_normal((t_n, e)).astype(np.float32)

    model = EnKFModel(
        init_sample=lambda k, n_: jax.random.normal(k, (n_, d)),
        trans_sample=lambda k, x, t: 0.98 * x
        + 0.1 * jax.random.normal(k, x.shape),
        obs_fn=lambda x, t: x[:, jnp.asarray(h_rows)],
        obs_cov=jnp.eye(e, dtype=jnp.float32),
    )
    res = ensemble_kalman_filter(jax.random.key(0), model, ys, n)
    assert np.isfinite(float(res.loglik))
    assert res.means.shape == (t_n, d)
    assert np.isfinite(np.asarray(res.ensemble)).all()


def test_validation_errors():
    _, ys = _data(10)
    with pytest.raises(ValueError, match="n_ensemble"):
        ensemble_kalman_filter(jax.random.key(0), _linear_model(), ys, 1)
    bad = _linear_model()._replace(obs_cov=jnp.eye(2, dtype=jnp.float32))
    with pytest.raises(ValueError, match="obs_cov"):
        ensemble_kalman_filter(jax.random.key(0), bad, ys, 8)


def test_enkf_mesh_sharded_parity():
    """Member-axis sharding over the 8-device mesh must agree with
    single-device to float-reduction tolerance (the anomaly products
    become all-reduced matmul partials)."""
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    _, ys = _data(20, seed=3)
    a = ensemble_kalman_filter(jax.random.key(0), _linear_model(), ys,
                               256)
    b = ensemble_kalman_filter(jax.random.key(0), _linear_model(), ys,
                               256, mesh=make_walker_mesh())
    assert float(a.loglik) == pytest.approx(float(b.loglik), abs=1e-2)
    np.testing.assert_allclose(np.asarray(a.means), np.asarray(b.means),
                               atol=1e-3)
    with pytest.raises(ValueError, match="divisible"):
        ensemble_kalman_filter(jax.random.key(0), _linear_model(), ys,
                               63, mesh=make_walker_mesh())


def test_etkf_linear_gaussian_oracle_and_determinism():
    """Square-root variant: no observation perturbations, so (a) two
    runs with the same key are bitwise identical even though the
    stochastic variant would differ per analysis draw, and (b) the
    linear-Gaussian oracle holds at MODERATE N with tight tolerances
    (the exact-covariance transform removes the perturbation noise)."""
    t_n = 40
    _, ys = _data(t_n, seed=3)
    f = kalman_filter(_lgss(), ys)
    m_true = np.asarray(f.means)[:, 0]
    sd_true = np.sqrt(np.asarray(f.covs)[:, 0, 0])
    exact_ll = float(lgss_loglik(_lgss(), ys))

    res = ensemble_kalman_filter(jax.random.key(0), _linear_model(), ys,
                                 128, variant="etkf")
    res2 = ensemble_kalman_filter(jax.random.key(0), _linear_model(), ys,
                                  128, variant="etkf")
    np.testing.assert_array_equal(np.asarray(res.ensemble),
                                  np.asarray(res2.ensemble))
    err = np.abs(np.asarray(res.means)[:, 0] - m_true)
    assert (err < 6.0 * sd_true / np.sqrt(128.0) + 0.02).all(), err.max()
    np.testing.assert_allclose(np.asarray(res.spread)[:, 0], sd_true,
                               rtol=0.12, atol=0.02)
    assert abs(float(res.loglik) - exact_ll) < 0.6, (
        float(res.loglik), exact_ll,
    )


def test_etkf_beats_stochastic_at_small_n():
    """The point of the square root: at N=10 the stochastic variant's
    perturbation noise corrupts the spread; the ETKF's exact-covariance
    transform must track the exact posterior sd more closely (averaged
    over time; both filters see identical data)."""
    t_n = 60
    _, ys = _data(t_n, seed=7)
    f = kalman_filter(_lgss(), ys)
    sd_true = np.sqrt(np.asarray(f.covs)[:, 0, 0])

    def spread_err(variant):
        errs = []
        for seed in range(4):
            res = ensemble_kalman_filter(
                jax.random.key(seed), _linear_model(), ys, 10,
                variant=variant,
            )
            errs.append(np.abs(np.asarray(res.spread)[:, 0] - sd_true)
                        .mean())
        return float(np.mean(errs))

    e_etkf, e_stoch = spread_err("etkf"), spread_err("stochastic")
    assert e_etkf < e_stoch, (e_etkf, e_stoch)

    with pytest.raises(ValueError, match="variant"):
        ensemble_kalman_filter(jax.random.key(0), _linear_model(), ys,
                               8, variant="enks")
