"""DSL time-series priors (GaussianRandomWalk, AR1): densities checked
against the dense multivariate-normal truth (both are Gaussian processes
with closed-form covariances), prior draws against analytic moments, and
a declarative local-level model fit end-to-end with NUTS."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu.dsl import AR1, GaussianRandomWalk, Model, Normal, HalfNormal

T = 8


def _dense_logpdf(x, mean, cov):
    d = x - mean
    sign, logdet = np.linalg.slogdet(cov)
    return -0.5 * (len(x) * np.log(2 * np.pi) + logdet
                   + d @ np.linalg.solve(cov, d))


def test_grw_logpdf_vs_dense():
    scale, init_scale, drift = 0.7, 1.3, 0.2
    d = GaussianRandomWalk(scale=scale, init_scale=init_scale, drift=drift)
    # cov[i, j] = init^2 + min(i, j) * scale^2 ; mean_t = (t+1) * drift
    idx = np.arange(T)
    cov = init_scale**2 + np.minimum(idx[:, None], idx[None, :]) * scale**2
    mean = (idx + 1.0) * drift
    rng = np.random.default_rng(0)
    for _ in range(3):
        x = rng.standard_normal(T) * 1.5 + mean
        np.testing.assert_allclose(
            float(d.logpdf(jnp.asarray(x, jnp.float32))),
            _dense_logpdf(x, mean, cov), rtol=2e-4,
        )


def test_ar1_logpdf_vs_dense():
    phi, sigma, mu = 0.8, 0.5, -1.0
    d = AR1(phi=phi, sigma=sigma, mu=mu)
    idx = np.arange(T)
    var = sigma**2 / (1 - phi**2)
    cov = var * phi ** np.abs(idx[:, None] - idx[None, :])
    rng = np.random.default_rng(1)
    for _ in range(3):
        x = rng.standard_normal(T) + mu
        np.testing.assert_allclose(
            float(d.logpdf(jnp.asarray(x, jnp.float32))),
            _dense_logpdf(x, np.full(T, mu), cov), rtol=2e-4,
        )


def test_prior_draw_moments():
    n = 40000
    grw = GaussianRandomWalk(scale=0.5, init_scale=1.0, drift=0.1)
    xs = np.asarray(grw.sample(jax.random.key(0), (n, T)), np.float64)
    idx = np.arange(T)
    np.testing.assert_allclose(xs.mean(0), (idx + 1) * 0.1, atol=0.03)
    np.testing.assert_allclose(
        xs.var(0), 1.0 + idx * 0.25, rtol=0.05, atol=0.02
    )

    ar = AR1(phi=0.9, sigma=0.4, mu=2.0)
    ys = np.asarray(ar.sample(jax.random.key(1), (n, T)), np.float64)
    var = 0.4**2 / (1 - 0.81)
    np.testing.assert_allclose(ys.mean(0), np.full(T, 2.0), atol=0.03)
    np.testing.assert_allclose(ys.var(0), np.full(T, var), rtol=0.06)
    # lag-1 autocorrelation = phi at stationarity
    c = ((ys[:, 1:] - 2.0) * (ys[:, :-1] - 2.0)).mean()
    np.testing.assert_allclose(c / var, 0.9, atol=0.03)


def test_ar1_batch_sample_shape_and_time_axis():
    ar = AR1(phi=0.7, sigma=1.0)
    x = ar.sample(jax.random.key(2), (5, 3, T))
    assert x.shape == (5, 3, T)
    # consecutive-time correlation must be along the LAST axis: lag-1
    # correlation across time >> correlation across the batch axis
    xs = np.asarray(ar.sample(jax.random.key(3), (20000, T)), np.float64)
    lag_t = np.corrcoef(xs[:, 0], xs[:, 1])[0, 1]
    assert lag_t > 0.6
    with pytest.raises(ValueError, match="shape"):
        ar.sample(jax.random.key(4), ())
    with pytest.raises(ValueError, match="shape"):
        GaussianRandomWalk().sample(jax.random.key(4), ())


@pytest.mark.slow
def test_declarative_local_level_nuts():
    """x ~ GRW prior, y_t ~ N(x_t, sigma_r): the posterior trajectory
    must track the latent truth well inside the observation noise, and
    sigma_r must be recovered (the declarative twin of the
    LGSSKernel/Gibbs test, fit jointly by NUTS)."""
    from mcmcpp_tpu import NUTSSampler

    rng = np.random.default_rng(3)
    t_n, sig_q, sig_r = 40, 0.3, 0.8
    x_true = np.cumsum(rng.normal(0, sig_q, t_n)) + 1.0
    ys = (x_true + rng.normal(0, sig_r, t_n)).astype(np.float32)

    m = (
        Model()
        .param("x", GaussianRandomWalk(scale=sig_q, init_scale=3.0),
               shape=(t_n,))
        .param("sigma_r", HalfNormal(2.0))
        .observe("y", lambda p: Normal(p["x"], p["sigma_r"]), ys)
    )
    logp, dim, constrain = m.build()
    s = NUTSSampler(logp, n_params=dim, n_chains=8, seed=0)
    s.init(np.asarray(m.prior_sample(jax.random.key(0), 8)))
    s.warmup(400)
    s.run(400)
    post = constrain(np.asarray(s.get_samples(flat=True)))
    xs = post["x"]
    rmse = float(np.sqrt(((xs.mean(0) - x_true) ** 2).mean()))
    assert rmse < sig_r, rmse
    sr_mean = float(post["sigma_r"].mean())
    assert 0.5 < sr_mean < 1.2, sr_mean
