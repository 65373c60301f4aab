"""Bridge sampling: evidence from plain posterior draws (Meng & Wong
1996), oracled against analytic/quadrature truth and the other engines."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu.analysis import bridge_log_evidence

# conjugate model: theta ~ N(0, 4 I_2), y_i ~ N(theta, 1), analytic logZ
DIM = 2
Y = np.array([[1.2, 0.4], [0.8, 1.1], [1.5, 0.2], [0.3, 0.9]], np.float32)
N_OBS = Y.shape[0]


def logpost(t):
    return (-0.5 * jnp.sum(t * t) / 4.0
            - DIM / 2 * jnp.log(2 * jnp.pi * 4.0)
            - 0.5 * jnp.sum((Y - t[None, :]) ** 2)
            - N_OBS * DIM / 2 * jnp.log(2 * jnp.pi))


def _logz_true():
    # per dim: y ~ N(0, 4 11^T + I)
    out = 0.0
    for d in range(DIM):
        y = Y[:, d].astype(np.float64)
        cov = 4.0 * np.ones((N_OBS, N_OBS)) + np.eye(N_OBS)
        sign, logdet = np.linalg.slogdet(cov)
        out += (-0.5 * y @ np.linalg.solve(cov, y) - 0.5 * logdet
                - N_OBS / 2 * np.log(2 * np.pi))
    return out


LOGZ_TRUE = _logz_true()


def _exact_posterior_draws(n, seed):
    prec = 1.0 / 4.0 + N_OBS
    mean = Y.sum(0) / prec
    sd = prec**-0.5
    rng = np.random.default_rng(seed)
    return mean[None, :] + sd * rng.standard_normal((n, DIM))


def test_bridge_matches_analytic_on_exact_draws():
    r = bridge_log_evidence(logpost, _exact_posterior_draws(4000, 0),
                            seed=1)
    assert r.converged
    assert r.rel_ess > 0.1
    assert r.logz == pytest.approx(LOGZ_TRUE, abs=0.05)


def test_bridge_on_real_mcmc_draws_and_smc_crosscheck():
    from mcmcpp_tpu import NUTSSampler
    from mcmcpp_tpu.smc import SMCSampler

    s = NUTSSampler(logpost, n_chains=16, n_params=DIM, seed=0)
    s.init_ball(np.zeros(DIM), scale=0.5)
    s.warmup(300)
    s.run(800, thin=2)
    draws = s.get_samples(flat=True)
    r = bridge_log_evidence(logpost, draws, seed=2)
    assert r.converged
    assert r.logz == pytest.approx(LOGZ_TRUE, abs=0.1)
    smc = SMCSampler(
        lambda t: (-0.5 * jnp.sum(t * t) / 4.0
                   - DIM / 2 * jnp.log(2 * jnp.pi * 4.0)),
        lambda t: (-0.5 * jnp.sum((Y - t[None, :]) ** 2)
                   - N_OBS * DIM / 2 * jnp.log(2 * jnp.pi)),
        lambda key, n: 2.0 * jax.random.normal(key, (n, DIM)),
        n_particles=2048, n_params=DIM, n_mcmc=5, seed=0)
    smc.run()
    assert r.logz == pytest.approx(smc.log_evidence, abs=0.2)


def test_bridge_validation_and_diagnostics():
    with pytest.raises(ValueError, match="N >= 8"):
        bridge_log_evidence(logpost, np.zeros((4, DIM)))
    bad = _exact_posterior_draws(2000, 3)

    def broken_logpost(t):
        return jnp.where(t[0] > 0, jnp.nan, 0.0)

    with pytest.raises(ValueError, match="non-finite"):
        bridge_log_evidence(broken_logpost, bad, seed=4)


def test_bridge_hard_constraint_support():
    """Proposal mass falling in a log L = -inf region must not break the
    estimator (those draws contribute zero to the numerator)."""
    def gated(t):
        base = logpost(t)
        return jnp.where(t[0] < -0.2, -jnp.inf, base)

    # quadrature truth on the gated posterior
    g = np.linspace(-0.2, 12, 150001)
    g2 = np.linspace(-12, 12, 150001)

    def dim_lp(y, grid):
        return (-0.5 * grid**2 / 4.0 - 0.5 * np.log(2 * np.pi * 4.0)
                + np.sum(-0.5 * (y[:, None] - grid[None, :]) ** 2, 0)
                - N_OBS / 2 * np.log(2 * np.pi))

    lp0, lp1 = dim_lp(Y[:, 0].astype(np.float64), g), dim_lp(
        Y[:, 1].astype(np.float64), g2)
    m0, m1 = lp0.max(), lp1.max()
    truth = (m0 + np.log(np.trapezoid(np.exp(lp0 - m0), g))
             + m1 + np.log(np.trapezoid(np.exp(lp1 - m1), g2)))
    # exact draws from the truncated posterior by rejection
    d = _exact_posterior_draws(20000, 5)
    d = d[d[:, 0] >= -0.2][:4000]
    r = bridge_log_evidence(gated, d, seed=6)
    assert r.converged
    assert r.logz == pytest.approx(truth, abs=0.1)
