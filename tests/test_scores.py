"""Proper-scoring-rule oracles (Gneiting & Raftery 2007).

The Gaussian CRPS has a closed form, sample CRPS must converge to it;
propriety is tested behaviorally: the true predictive scores better
than a biased or an overdispersed one. Energy score reduces to CRPS at
D=1 (same draws, same number).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu.analysis import crps_ensemble, energy_score


def _gauss_crps(mu, sigma, y):
    from scipy.stats import norm

    z = (y - mu) / sigma
    return sigma * (z * (2 * norm.cdf(z) - 1) + 2 * norm.pdf(z)
                    - 1 / np.sqrt(np.pi))


def test_crps_matches_gaussian_closed_form():
    rng = np.random.default_rng(0)
    mu, sigma = 1.2, 0.7
    ys = np.array([0.5, 1.2, 2.8])
    draws = (mu + sigma * rng.standard_normal((3, 8192))).astype(
        np.float32
    )
    got = np.asarray(crps_ensemble(draws, ys.astype(np.float32)))
    want = _gauss_crps(mu, sigma, ys)
    np.testing.assert_allclose(got, want, rtol=0.03, atol=0.01)


def test_propriety_true_predictive_wins():
    """Averaged over many outcomes drawn from N(0,1), the N(0,1)
    forecast must beat a shifted and an overdispersed forecast."""
    rng = np.random.default_rng(1)
    ys = rng.standard_normal(512).astype(np.float32)
    n = 2048

    def mean_score(mu, sigma, seed):
        d = (mu + sigma * np.random.default_rng(seed)
             .standard_normal((512, n))).astype(np.float32)
        return float(np.mean(np.asarray(crps_ensemble(d, ys))))

    s_true = mean_score(0.0, 1.0, 2)
    s_shift = mean_score(0.8, 1.0, 3)
    s_wide = mean_score(0.0, 2.5, 4)
    assert s_true < s_shift and s_true < s_wide, (
        s_true, s_shift, s_wide,
    )


def test_energy_score_reduces_to_crps_at_1d():
    rng = np.random.default_rng(5)
    draws = rng.standard_normal(512).astype(np.float32)
    y = np.float32(0.3)
    a = float(crps_ensemble(draws, y))
    b = float(energy_score(draws[:, None], np.array([y])))
    assert a == pytest.approx(b, rel=1e-4)


def test_energy_score_multivariate_detects_broken_correlation():
    """Two forecasts with IDENTICAL marginals, one with the true
    correlation and one independent: only a multivariate score can
    separate them — the correct joint must win."""
    rng = np.random.default_rng(7)
    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    chol = np.linalg.cholesky(cov)
    ys = (rng.standard_normal((256, 2)) @ chol.T).astype(np.float32)

    def mean_es(correlated, seed):
        r = np.random.default_rng(seed)
        total = 0.0
        for y in ys:
            z = r.standard_normal((1024, 2))
            d = (z @ chol.T if correlated else z).astype(np.float32)
            total += float(energy_score(d, y))
        return total / len(ys)

    es_true = mean_es(True, 11)
    es_indep = mean_es(False, 12)
    assert es_true < es_indep, (es_true, es_indep)


def test_crps_fair_at_small_ensembles():
    """Ferro (2014) fairness: averaged over many SMALL (n=4) ensembles
    drawn from the true predictive, the fair CRPS must equal the
    closed-form CRPS of that predictive — the plain 1/n^2 estimator
    would sit ~0.14 too high here (E|X-X'|/2n)."""
    rng = np.random.default_rng(3)
    y = np.float32(0.4)
    draws = rng.standard_normal((20000, 4)).astype(np.float32)
    got = float(np.mean(np.asarray(crps_ensemble(draws, np.full(
        20000, y, np.float32)))))
    want = float(_gauss_crps(0.0, 1.0, float(y)))
    assert abs(got - want) < 0.02, (got, want)
    with pytest.raises(ValueError, match="at least 2"):
        crps_ensemble(np.ones((3, 1), np.float32), np.zeros(3, np.float32))
