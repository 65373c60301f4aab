"""Rao-Blackwellised particle filter oracles.

Strategy (SURVEY.md §4 pattern): exact truths via the LGSS machinery —
a single-regime model must reproduce the Kalman log-evidence (all
particles carry identical moments, so there is NO Monte Carlo noise),
and a 2-regime switching model at small T has an exact marginal via
enumeration of all K^T regime paths through the time-varying
`lgss_loglik` (the full-tv path built in round 4). The Rao-Blackwell
variance-ordering claim is measured against the plain bootstrap filter
on the joint (z, x). Fixed seeds, generous MC tolerances.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu import (
    PMMHSampler,
    StateSpaceModel,
    particle_filter,
    rao_blackwell_filter,
    switching_model,
)
from mcmcpp_tpu.models.lgss import LGSSParams, lgss_loglik, lgss_params

# -- a 2-regime switching local-level model -----------------------------------

TRANS = np.array([[0.9, 0.1], [0.2, 0.8]], np.float32)
A_K = np.stack([np.eye(1), 0.6 * np.eye(1)]).astype(np.float32)
B_K = np.zeros((2, 1), np.float32)
Q_K = np.stack([0.1 * np.eye(1), 0.6 * np.eye(1)]).astype(np.float32)
H_K = np.stack([np.eye(1), np.eye(1)]).astype(np.float32)
C_K = np.zeros((2, 1), np.float32)
R_K = np.stack([0.25 * np.eye(1), 0.25 * np.eye(1)]).astype(np.float32)
M0, P0 = np.zeros(1, np.float32), 2.0 * np.eye(1, dtype=np.float32)
INIT = np.array([0.5, 0.5], np.float32)


def _switch_model():
    return switching_model(TRANS, A_K, B_K, Q_K, H_K, C_K, R_K, M0, P0,
                           init_probs=INIT)


def _switch_data(t_n, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.integers(0, 2)
    x = rng.normal(0.0, np.sqrt(2.0))
    ys, zs = [], []
    for t in range(t_n):
        if t > 0:
            z = rng.choice(2, p=TRANS[z])
            x = (A_K[z, 0, 0] * x
                 + np.sqrt(Q_K[z, 0, 0]) * rng.standard_normal())
        ys.append(x + 0.5 * rng.standard_normal())
        zs.append(z)
    return np.array(zs), np.asarray(ys, np.float32)


def _enum_truth(ys):
    """Exact log p(y) and filtered P(z_T | y) by enumerating all 2^T
    regime paths through the time-varying Kalman evidence."""
    t_n = len(ys)
    terms, z_last = [], []
    for code in range(2 ** t_n):
        path = [(code >> t) & 1 for t in range(t_n)]
        lp = np.log(INIT[path[0]])
        for t in range(1, t_n):
            lp += np.log(TRANS[path[t - 1], path[t]])
        p = LGSSParams(
            A=jnp.asarray(A_K[path]), b=jnp.asarray(B_K[path]),
            Q=jnp.asarray(Q_K[path]), H=jnp.asarray(H_K[path]),
            c=jnp.asarray(C_K[path]), R=jnp.asarray(R_K[path]),
            m0=jnp.asarray(M0), P0=jnp.asarray(P0),
        )
        terms.append(lp + float(lgss_loglik(p, ys[:, None])))
        z_last.append(path[-1])
    terms = np.asarray(terms, np.float64)
    from scipy.special import logsumexp

    logz = float(logsumexp(terms))
    w = np.exp(terms - terms.max())
    w /= w.sum()
    p_last1 = float(w[np.asarray(z_last) == 1].sum())
    return logz, p_last1


def test_single_regime_reproduces_kalman_exactly():
    """K=1: every particle carries the same moments, so the 'estimate'
    is the exact Kalman evidence with zero MC noise."""
    rng = np.random.default_rng(3)
    ys = np.cumsum(rng.standard_normal(40)).astype(np.float32)
    model = switching_model(
        np.ones((1, 1), np.float32), A_K[:1], B_K[:1], Q_K[:1],
        H_K[:1], C_K[:1], R_K[:1], M0, P0,
    )
    res = rao_blackwell_filter(jax.random.key(0), model, ys, 64)
    exact = float(lgss_loglik(lgss_params(
        A=1.0, b=0.0, Q=0.1, H=1.0, c=0.0, R=0.25, m0=0.0, P0=2.0,
    ), ys))
    assert float(res.loglik) == pytest.approx(exact, abs=5e-3)
    assert np.asarray(res.ess) == pytest.approx(64.0, abs=1e-3)


def test_switching_loglik_matches_enumeration():
    _, ys = _switch_data(8, seed=5)
    logz, p_last1 = _enum_truth(ys)

    def one(key):
        return rao_blackwell_filter(key, _switch_model(), ys, 1024)

    res = jax.vmap(one)(jax.random.split(jax.random.key(1), 16))
    lls = np.asarray(res.loglik, np.float64)
    # RB'd estimator at N=1024, T=8: tiny variance; mean must sit at the
    # truth (Jensen bias is second-order here)
    assert abs(lls.mean() - logz) < 0.05, (lls.mean(), logz)
    assert lls.std() < 0.1
    # filtered regime probabilities at T match the enumeration
    p1 = np.asarray(res.z_stats, np.float64)[:, -1, 1].mean()
    assert abs(p1 - p_last1) < 0.05, (p1, p_last1)


def test_rao_blackwell_variance_strictly_below_plain_pf():
    """The point of the construction: marginalizing x must shrink the
    loglik-estimator variance vs a bootstrap filter on the joint
    (z, x) with the same particle count."""
    _, ys = _switch_data(30, seed=9)

    def joint_ssm():
        def init_sample(key, n, th):
            kz, kx = jax.random.split(key)
            z = jax.random.categorical(
                kz, jnp.log(jnp.asarray(INIT)), shape=(n,)
            ).astype(jnp.float32)
            x = jnp.sqrt(2.0) * jax.random.normal(kx, (n,))
            return jnp.stack([z, x], axis=1)

        def trans_sample(key, zx, t, th):
            kz, kx = jax.random.split(key)
            zi = zx[:, 0].astype(jnp.int32)
            z = jax.random.categorical(
                kz, jnp.log(jnp.asarray(TRANS))[zi], axis=-1
            )
            a = jnp.asarray(A_K)[z, 0, 0]
            q = jnp.asarray(Q_K)[z, 0, 0]
            x = a * zx[:, 1] + jnp.sqrt(q) * jax.random.normal(
                kx, (zx.shape[0],)
            )
            return jnp.stack([z.astype(jnp.float32), x], axis=1)

        def obs_logpdf(y, zx, t, th):
            r = 0.25
            zc = (y[0] - zx[:, 1])
            return -0.5 * zc * zc / r - 0.5 * jnp.log(
                2.0 * jnp.pi * r
            )

        return StateSpaceModel(init_sample, trans_sample, obs_logpdf)

    keys = jax.random.split(jax.random.key(7), 48)
    ll_rb = np.asarray(jax.vmap(
        lambda k: rao_blackwell_filter(k, _switch_model(), ys, 128).loglik
    )(keys), np.float64)
    ll_pf = np.asarray(jax.vmap(
        lambda k: particle_filter(k, joint_ssm(), None, ys, 128).loglik
    )(keys), np.float64)
    assert ll_rb.var(ddof=1) < 0.5 * ll_pf.var(ddof=1), (
        ll_rb.var(ddof=1), ll_pf.var(ddof=1),
    )
    # both estimate the same quantity
    assert abs(ll_rb.mean() - ll_pf.mean()) < max(
        4.0 * ll_pf.std(ddof=1) / np.sqrt(48.0), 0.2
    )


def test_filtered_state_tracks_truth():
    """Weighted filtered mean must track the simulated latent within a
    few observation SDs (smoke-level; the exact-oracle coverage is the
    enumeration test)."""
    _, ys = _switch_data(60, seed=13)
    res = rao_blackwell_filter(jax.random.key(2), _switch_model(), ys,
                               512)
    err = np.abs(np.asarray(res.x_means)[:, 0] - ys)
    assert err.mean() < 1.0  # innovations are O(sqrt(R + Q)) ~ 0.6
    assert np.isfinite(np.asarray(res.z_stats)).all()
    probs = np.asarray(res.z_stats)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)


def test_pmmh_with_exact_loglik_matches_grid():
    """loglik_fn override: plugging the EXACT Kalman likelihood into
    PMMH degenerates to plain MH on the hyperparameter posterior — it
    must hit the dense-grid truth (also certifies the override path a
    Rao-Blackwellised estimator would use)."""
    rng = np.random.default_rng(0)
    x = np.cumsum(0.35 * rng.standard_normal(50)) + 1.0
    ys = (x + 0.6 * rng.standard_normal(50)).astype(np.float32)

    def exact_ll(th):
        return lgss_loglik(lgss_params(
            A=1.0, b=0.0, Q=0.35**2, H=1.0, c=0.0,
            R=jnp.exp(2.0 * th[0]), m0=1.0, P0=2.0,
        ), ys)

    grid = np.linspace(-2.5, 1.5, 401)
    ll = np.asarray(jax.vmap(
        lambda g: exact_ll(jnp.asarray([g]))
    )(jnp.asarray(grid, jnp.float32)), np.float64)
    logpost = ll - 0.5 * grid**2
    w = np.exp(logpost - logpost.max())
    w /= w.sum()
    mean_true = float(w @ grid)
    sd_true = float(np.sqrt(w @ (grid - mean_true) ** 2))

    s = PMMHSampler(
        ssm=None, ys=None,
        log_prior=lambda th: -0.5 * th[0] * th[0],
        n_params=1, proposal_scale=0.3, n_chains=16, seed=1,
        loglik_fn=lambda key, th: exact_ll(th),
    )
    s.init(np.zeros((16, 1), np.float32))
    s.run(400)
    draws = np.asarray(s.get_samples(burn_in=100, flat=True))[:, 0]
    tol = 4.0 * sd_true / np.sqrt(draws.size / 15.0) + 0.05
    assert abs(draws.mean() - mean_true) < tol, (
        draws.mean(), mean_true, tol,
    )
    assert 0.6 * sd_true < draws.std() < 1.6 * sd_true


def test_validation_errors():
    with pytest.raises(ValueError, match="trans_probs"):
        switching_model(np.ones((2, 3)), A_K, B_K, Q_K, H_K, C_K, R_K,
                        M0, P0)
    with pytest.raises(ValueError, match="regime slices"):
        switching_model(TRANS, A_K[:1], B_K, Q_K, H_K, C_K, R_K, M0, P0)
    with pytest.raises(ValueError, match="ssm or a loglik_fn"):
        PMMHSampler(ssm=None, ys=None, log_prior=lambda th: 0.0,
                    n_params=1)


def test_rbpf_mesh_sharded_parity():
    """Particle-axis sharding over the 8-device mesh must agree with
    single-device to float-reduction tolerance."""
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    _, ys = _switch_data(20, seed=3)
    a = rao_blackwell_filter(jax.random.key(0), _switch_model(), ys, 64)
    b = rao_blackwell_filter(jax.random.key(0), _switch_model(), ys, 64,
                             mesh=make_walker_mesh())
    assert float(a.loglik) == pytest.approx(float(b.loglik), abs=1e-3)
    np.testing.assert_allclose(np.asarray(a.z_stats),
                               np.asarray(b.z_stats), atol=1e-4)
    with pytest.raises(ValueError, match="divisible"):
        rao_blackwell_filter(jax.random.key(0), _switch_model(), ys, 63,
                             mesh=make_walker_mesh())


def test_rbpf_forecast_single_regime_matches_kalman_forecast():
    """K=1: every particle carries identical moments, regime sampling is
    a no-op — the RBPF forecast must reproduce the exact Kalman
    forecast moments with NO Monte Carlo noise."""
    from mcmcpp_tpu import rbpf_forecast
    from mcmcpp_tpu.models.lgss import forecast as lgss_forecast

    rng = np.random.default_rng(3)
    ys = np.cumsum(rng.standard_normal(30)).astype(np.float32)
    model = switching_model(
        np.ones((1, 1), np.float32), A_K[:1], B_K[:1], Q_K[:1],
        H_K[:1], C_K[:1], R_K[:1], M0, P0,
    )
    res = rao_blackwell_filter(jax.random.key(0), model, ys, 32)
    ms, cs, zs = rbpf_forecast(
        jax.random.key(1), model, res.final_z, res.final_means,
        res.final_covs, res.final_log_weights, 30, 4,
    )
    f_m, f_c, _, _ = lgss_forecast(lgss_params(
        A=1.0, b=0.0, Q=0.1, H=1.0, c=0.0, R=0.25, m0=0.0, P0=2.0,
    ), ys, horizon=4)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(f_m),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(f_c),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(zs), 1.0, atol=1e-6)


def test_rbpf_forecast_switching_uncertainty_grows():
    """2-regime forecast: predictive variance must grow with horizon
    (regimes mix toward stationarity and Q accumulates), and regime
    probabilities must drift toward the chain's stationary law."""
    from mcmcpp_tpu import rbpf_forecast

    _, ys = _switch_data(40, seed=7)
    res = rao_blackwell_filter(jax.random.key(0), _switch_model(), ys,
                               1024)
    ms, cs, zs = rbpf_forecast(
        jax.random.key(1), _switch_model(), res.final_z,
        res.final_means, res.final_covs, res.final_log_weights, 40, 12,
    )
    v = np.asarray(cs)[:, 0, 0]
    assert v[-1] > v[0]
    # stationary law of TRANS = [[.9,.1],[.2,.8]] is (2/3, 1/3)
    np.testing.assert_allclose(np.asarray(zs)[-1], [2 / 3, 1 / 3],
                               atol=0.08)
