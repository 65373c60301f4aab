"""Goodness-of-fit (KS) tests per mover + batch-means ESS validation.

Stronger than moment checks: the full marginal CDFs must match analytic
truth. Thinning by ~ACT before the KS test keeps samples ~independent.
"""

import numpy as np
import jax
from scipy import stats
import pytest

from mcmcpp_tpu import (
    AutoRegressiveMove, DifferentialEvolutionMove, EnsembleSampler,
    EnsembleSliceMove, NUTSSampler, StretchMove, WalkMove, analysis,
)

from tests.targets import skewed_gaussian_logp, EPSILON


def _marginal_sds():
    # skewed-Gaussian true covariance diag: 1+eps, (1+eps)/4
    return np.sqrt([1 + EPSILON, (1 + EPSILON) / 4])


@pytest.mark.parametrize("mover", [
    StretchMove(), WalkMove(n_samples=6), DifferentialEvolutionMove(),
    EnsembleSliceMove(),
])
@pytest.mark.slow
def test_ks_marginals(mover):
    s = EnsembleSampler(skewed_gaussian_logp, n_walkers=256, n_params=2,
                        seed=3, mover=mover)
    s.init_ball(np.zeros(2), scale=0.5, seed=4)
    s.run_mcmc(500, store=False)
    s.run_mcmc(4000, thin=20)  # thin ≳ ACT -> ~independent draws
    flat = s.get_samples(flat=True)
    sds = _marginal_sds()
    for i in range(2):
        # subsample to keep KS power reasonable vs residual correlation
        x = flat[::8, i]
        p = stats.kstest(x, "norm", args=(0.0, sds[i])).pvalue
        assert p > 1e-3, f"param {i}: KS p={p}"


def test_ks_nuts_standard_normal():
    s = NUTSSampler(lambda t: -0.5 * (t @ t), n_chains=32, n_params=2, seed=5)
    s.init_ball(np.zeros(2), scale=1.0, seed=6)
    s.warmup(300)
    s.run(2000, thin=5)
    flat = s.get_samples(burn_in=50, flat=True)
    for i in range(2):
        p = stats.kstest(flat[::16, i], "norm").pvalue
        assert p > 1e-3


def test_batch_means_ess_matches_fft_on_ar1():
    """Both ESS estimators must agree on the AR(1) oracle."""
    phis = np.array([0.8])
    mover = AutoRegressiveMove(np.zeros(1), phis, np.ones(1))
    s = EnsembleSampler(lambda t: 0.0, n_walkers=64, n_params=1, seed=0,
                        mover=mover)
    s.set_initial_walker_pos(mover.initial_positions(jax.random.key(1), 64))
    s.run_mcmc(16384)
    samples = s.get_samples()
    ess_fft = analysis.effective_sample_size(samples)[0]
    ess_bm = analysis.batch_means_ess(samples, n_batches=64)[0]
    true_ess = 16384 * 64 / 9.0  # tau = (1+phi)/(1-phi) = 9
    assert ess_fft == pytest.approx(true_ess, rel=0.15)
    assert ess_bm == pytest.approx(true_ess, rel=0.25)


def test_batch_means_ess_iid_upper_bound():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2048, 16, 2))
    ess = analysis.batch_means_ess(x)
    n = 2048 // 32 * 32 * 16
    assert np.all(ess > 0.5 * n) and np.all(ess <= n)


def test_batch_means_ess_too_short():
    with pytest.raises(ValueError):
        analysis.batch_means_ess(np.zeros((16, 4, 1)), n_batches=32)


def test_multivariate_ess_iid_is_n():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4096, 8, 3))
    mess = analysis.multivariate_ess(x)
    assert mess == pytest.approx(4096 * 8, rel=0.12)


def test_multivariate_ess_ar1_oracle():
    # independent AR(1) coordinates, common phi: det-ratio^(1/p) collapses
    # to the scalar asymptotic-variance ratio, so mESS = n (1-phi)/(1+phi)
    phi = 0.6
    rng = np.random.default_rng(2)
    e = rng.standard_normal((4096, 8, 3))
    ar = np.zeros_like(e)
    for t in range(1, 4096):
        ar[t] = phi * ar[t - 1] + e[t]
    mess = analysis.multivariate_ess(ar)
    assert mess == pytest.approx(4096 * 8 * (1 - phi) / (1 + phi), rel=0.2)


def test_multivariate_ess_correlation_invariance():
    # mESS is invariant under linear maps of the chain (both dets scale by
    # |A|^2) — the property min-over-coordinate ESS lacks
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4096, 8, 2))
    a = np.array([[2.0, 0.7], [0.0, 0.5]])
    m1 = analysis.multivariate_ess(x)
    m2 = analysis.multivariate_ess(x @ a.T)
    assert m2 == pytest.approx(m1, rel=1e-6)


def test_min_ess_required_published_values():
    # Vats, Flegal & Jones 2019: p=1, alpha=.05, eps=.05 -> 6146
    assert analysis.min_ess_required(1) == pytest.approx(6146.3, abs=0.5)
    # monotone in p, decreasing in eps
    assert analysis.min_ess_required(5) > analysis.min_ess_required(1)
    assert (analysis.min_ess_required(2, eps=0.01)
            > analysis.min_ess_required(2, eps=0.05))


def test_multivariate_ess_too_short():
    with pytest.raises(ValueError):
        analysis.multivariate_ess(np.zeros((16, 4, 2)), n_batches=32)
