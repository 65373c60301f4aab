"""Barker proposal (Livingstone & Zanella 2022): correctness + robustness.

The moments / sample-stats / dense-metric coverage rides the shared
parametrized matrices in test_gradient.py, test_sample_stats.py and
test_dense_metric.py; this file tests what is SPECIFIC to Barker:

- exactness of the Hastings correction (1-D Gaussian closed-form check of
  the increment density identity q(w|g) = 2 N(w; 0, eps^2) sigmoid(w g)),
- the robustness property that justifies the kernel's existence: step-size
  adaptation recovers from a catastrophically large initial step where the
  drift term would destabilise MALA,
- heavy-tailed target (Cauchy) moments of the CDF-transformed chain,
  a regime where MALA's proposal mean explodes in the tails.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu.gradient import BarkerSampler
from mcmcpp_tpu.gradient.barker import barker_kernel

from tests.targets import correlated_gaussian_logp_factory


def test_increment_density_identity():
    # Monte-Carlo check that the proposal increment w has density
    # 2 N(w; 0, eps^2) sigmoid(w*g): compare empirical CDF at a few
    # quantiles against the analytic integral for a fixed gradient.
    eps, g = 0.7, 1.3
    key = jax.random.key(0)
    kz, kb = jax.random.split(key)
    n = 200_000
    z = eps * jax.random.normal(kz, (n,))
    u = jax.random.uniform(kb, (n,))
    b = jnp.where(u < jax.nn.sigmoid(z * g), 1.0, -1.0)
    w = np.asarray(b * z)

    from scipy.stats import norm

    ts = np.linspace(-1.5, 1.5, 7)
    # analytic CDF: integral of 2 phi_eps(w) sigmoid(w g) dw via quadrature
    grid = np.linspace(-6 * eps, max(ts.max(), 6 * eps), 20001)
    pdf = 2.0 * norm.pdf(grid, scale=eps) / (1.0 + np.exp(-grid * g))
    cdf = np.cumsum(pdf) * (grid[1] - grid[0])
    for t in ts:
        emp = (w <= t).mean()
        ana = np.interp(t, grid, cdf)
        assert abs(emp - ana) < 4e-3, (t, emp, ana)


def test_kernel_is_exact_on_gaussian():
    # fixed (non-adapted) step: long chain on N(0,1) must match moments —
    # this isolates the Hastings correction from the adaptation machinery
    logp = lambda x: -0.5 * jnp.sum(x * x)
    kernel = barker_kernel(logp)
    inv_mass = jnp.ones((1,))

    def step(carry, key):
        (q, lp, g), _ = kernel(key, *carry, jnp.asarray(0.9), inv_mass)
        return (q, lp, g), q[0]

    q0 = jnp.zeros((1,))
    lp0, g0 = jax.value_and_grad(logp)(q0)
    keys = jax.random.split(jax.random.key(1), 60_000)
    _, xs = jax.lax.scan(step, (q0, lp0, g0), keys)
    xs = np.asarray(xs[5_000:])
    assert abs(xs.mean()) < 0.04
    assert abs(xs.var() - 1.0) < 0.05
    # skewness of N(0,1) is 0 — catches a sign error in the correction
    assert abs(((xs - xs.mean()) ** 3).mean()) < 0.08


@pytest.mark.slow
def test_adaptation_recovers_from_huge_step():
    # THE Barker selling point: start at step_size=50 on a unit Gaussian.
    # MALA's drift at that step throws proposals ~1250 sigma away and its
    # dual averaging has to crawl back through ~zero-acceptance territory;
    # Barker's flip probabilities just saturate and adaptation stays live.
    logp, cov = correlated_gaussian_logp_factory(dim=4, rho=0.5)
    s = BarkerSampler(logp, n_chains=32, n_params=4, seed=0, step_size=50.0)
    s.init_ball(np.zeros(4), scale=1.0, seed=1)
    s.warmup(500)
    s.run(1500)
    flat = s.get_samples(burn_in=200, flat=True)
    np.testing.assert_allclose(flat.mean(axis=0), np.zeros(4), atol=0.15)
    np.testing.assert_allclose(np.cov(flat.T), np.asarray(cov), atol=0.3)
    assert 0.2 < s.last_mean_accept < 0.7


@pytest.mark.slow
def test_heavy_tailed_target():
    # standard Cauchy: MALA is not geometrically ergodic here (the drift
    # vanishes in the tails but transient excursions destabilise
    # adaptation); Barker remains well behaved. Check the probability
    # integral transform of the draws is uniform.
    logp = lambda x: -jnp.sum(jnp.log1p(x * x))
    s = BarkerSampler(logp, n_chains=32, n_params=1, seed=3)
    s.init_ball(np.zeros(1), scale=1.0, seed=4)
    s.warmup(400)
    s.run(2000)
    flat = s.get_samples(burn_in=200, flat=True)[:, 0]
    u = np.arctan(flat) / np.pi + 0.5  # Cauchy CDF
    qs = np.quantile(u, [0.1, 0.25, 0.5, 0.75, 0.9])
    np.testing.assert_allclose(qs, [0.1, 0.25, 0.5, 0.75, 0.9], atol=0.03)
