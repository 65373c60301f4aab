"""Target library: analytic truths + the BASELINE mover-comparison configs.

Covers BASELINE.json configs #3 (mover comparison on the Rosenbrock banana)
and #4 (multimodal mixture with ACT convergence analysis).
"""

import numpy as np
import jax
import pytest

from mcmcpp_tpu import (
    EnsembleSampler, StretchMove, WalkMove, DifferentialEvolutionMove,
    NUTSSampler, analysis,
)
from mcmcpp_tpu.models import (
    correlated_gaussian, gaussian_mixture, neal_funnel, rosenbrock,
    skewed_gaussian,
)


def test_skewed_gaussian_truth_matches_tests_module():
    t = skewed_gaussian()
    from tests.targets import skewed_gaussian_cov
    np.testing.assert_allclose(t.cov, skewed_gaussian_cov())


def test_correlated_gaussian_logp_normalization_free():
    t = correlated_gaussian(dim=4, rho=0.3)
    x = np.random.default_rng(0).standard_normal(4).astype(np.float32)
    prec = np.linalg.inv(t.cov)
    expect = -0.5 * x @ prec @ x
    assert float(t.logp(x)) == pytest.approx(expect, rel=1e-4)


def test_mixture_moments_analytic():
    t = gaussian_mixture([[-3.0, 0.0], [3.0, 0.0]], scales=[1.0, 2.0])
    # mean is 0 by symmetry in x; cov_xx = E[s²+m²] = (1+9 + 4+9)/2 ... per-comp
    np.testing.assert_allclose(t.mean, [0.0, 0.0], atol=1e-12)
    assert t.cov[0, 0] == pytest.approx(0.5 * (1 + 9) + 0.5 * (4 + 9))
    assert t.cov[1, 1] == pytest.approx(0.5 * 1 + 0.5 * 4)


@pytest.mark.parametrize("mover", [
    StretchMove(a=3.0),
    WalkMove(n_samples=6),
    DifferentialEvolutionMove(),
])
@pytest.mark.slow
def test_rosenbrock_mover_comparison(mover):
    """BASELINE config #3: every ensemble mover recovers the banana's
    analytic x-marginal N(a, scale/2)."""
    t = rosenbrock(a=1.0, b=5.0, scale=4.0)
    s = EnsembleSampler(t.logp, n_walkers=256, n_params=2, seed=3,
                        mover=mover)
    s.init_ball(np.array([1.0, 1.0]), scale=0.5, seed=4)
    s.run_mcmc(2000, store=False)
    s.run_mcmc(12000, thin=4)
    flat = s.get_samples(flat=True)
    assert flat[:, 0].mean() == pytest.approx(1.0, abs=0.12)
    assert flat[:, 0].var() == pytest.approx(2.0, rel=0.25)  # scale/2
    assert (flat[:, 1] - flat[:, 0] ** 2).mean() == pytest.approx(0.0, abs=0.15)


def test_mixture_act_convergence_analysis():
    """BASELINE config #4: multimodal mixture; walkers hop modes and the
    ACT/ESS machinery flags (non-)convergence sensibly."""
    t = gaussian_mixture([[-2.0], [2.0]])
    s = EnsembleSampler(t.logp, n_walkers=128, n_params=1, seed=5,
                        mover=StretchMove(a=4.0))
    s.init_ball(np.zeros(1), scale=3.0, seed=6)
    s.run_mcmc(500, store=False)
    s.run_mcmc(6000, thin=2)
    samples = s.get_samples()
    flat = s.get_samples(flat=True)
    # both modes populated
    frac_right = (flat[:, 0] > 0).mean()
    assert 0.35 < frac_right < 0.65
    np.testing.assert_allclose(np.var(flat[:, 0]), t.cov[0, 0], rtol=0.2)
    tau = analysis.autocorr_time(samples)
    assert tau[0] > 0  # window closed -> converged estimate
    ess = analysis.effective_sample_size(samples)
    assert ess[0] > 500
    rhat = analysis.potential_scale_reduction(samples)
    assert rhat[0] < 1.1


@pytest.mark.slow
def test_funnel_nuts():
    """Neal's funnel v-marginal via NUTS (gradient stress target)."""
    t = neal_funnel(dim=5, sigma_v=1.5)
    s = NUTSSampler(t.logp, n_chains=32, n_params=5, seed=7, max_depth=8)
    s.init_ball(np.zeros(5), scale=1.0, seed=8)
    s.warmup(400)
    s.run(1500)
    v = s.get_samples(burn_in=100, flat=True)[:, 0]
    assert v.mean() == pytest.approx(0.0, abs=0.2)
    assert v.var() == pytest.approx(1.5**2, rel=0.3)


def test_linear_regression_conjugate_cross_engine():
    """Exact Gaussian posterior: NUTS, Laplace, and ADVI must all recover
    the SAME analytic mean/covariance — the strongest cross-engine oracle."""
    from mcmcpp_tpu import NUTSSampler, laplace
    from mcmcpp_tpu.models import bayesian_linear_regression

    t = bayesian_linear_regression(n_data=150, dim=4, seed=1)

    # Laplace is exact on a Gaussian posterior
    lap = laplace(t.logp, x0=np.zeros(t.dim))
    np.testing.assert_allclose(np.asarray(lap.mean), t.mean, atol=5e-3)
    np.testing.assert_allclose(np.asarray(lap.covariance), t.cov,
                               rtol=0.05, atol=1e-4)

    # NUTS within MC error
    s = NUTSSampler(t.logp, n_chains=16, n_params=t.dim, seed=2)
    s.init_ball(np.zeros(t.dim), scale=0.5, seed=3)
    s.warmup(300)
    s.run(1000)
    flat = s.get_samples(flat=True)
    sd = np.sqrt(np.diag(t.cov))
    assert np.all(np.abs(flat.mean(axis=0) - t.mean) < 0.1 * sd)
    np.testing.assert_allclose(flat.std(axis=0), sd, rtol=0.1)


def test_logistic_regression_laplace_vs_nuts():
    """No closed form; Laplace (O(1/n)-accurate at n=300) and NUTS must
    agree on posterior means within a few posterior SDs of MC error."""
    from mcmcpp_tpu import NUTSSampler, laplace
    from mcmcpp_tpu.models import logistic_regression

    t = logistic_regression(n_data=300, dim=3, seed=4)
    lap = laplace(t.logp, x0=np.zeros(t.dim))
    s = NUTSSampler(t.logp, n_chains=16, n_params=t.dim, seed=5)
    s.init_ball(np.zeros(t.dim), scale=0.3, seed=6)
    s.warmup(300)
    s.run(1000)
    flat = s.get_samples(flat=True)
    sd = np.sqrt(np.diag(np.asarray(lap.covariance)))
    assert np.all(np.abs(flat.mean(axis=0) - np.asarray(lap.mean)) < 0.3 * sd)
    np.testing.assert_allclose(flat.std(axis=0), sd, rtol=0.2)
    # the fitted coefficients point toward the generating weights
    corr = np.corrcoef(flat.mean(axis=0), t.extras["w_true"])[0, 1]
    assert corr > 0.9, corr
