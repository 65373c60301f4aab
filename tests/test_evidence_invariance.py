"""Likelihood-scaling invariance: Z(c·L) = c·Z(L).

Scaling the likelihood by a constant shifts every log L by log c
UNIFORMLY, which leaves every accept/swap/resample decision unchanged —
the sampler trajectories are identical, so each engine's log-evidence
must shift by exactly log c (up to float re-summation). A sharp, cheap
regression guard on every evidence ledger: any bookkeeping bug that
mixes shells/rungs/stages breaks the exact shift long before it shows
up against a Monte Carlo oracle.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

DIM = 2
LOG_C = 3.7


def log_prior(t):
    return -0.5 * jnp.sum(t**2) / 4.0 - DIM / 2 * jnp.log(2 * jnp.pi * 4.0)


def make_loglike(shift):
    def ll(t):
        return (-0.5 * jnp.sum((t - 1.0) ** 2)
                - DIM / 2 * jnp.log(2 * jnp.pi) + shift)

    return ll


def prior_sample(key, n):
    return 2.0 * jax.random.normal(key, (n, DIM))


def test_nested_sampling_scaling_invariance():
    from mcmcpp_tpu.nested import NestedSampler

    def run(shift):
        ns = NestedSampler(log_prior, make_loglike(shift), prior_sample,
                           n_params=DIM, n_live=300, batch=75, n_mcmc=10,
                           seed=0)
        return ns.run(dlogz=0.01)

    a, b = run(0.0), run(LOG_C)
    assert b.n_iters == a.n_iters  # identical trajectories
    assert b.logz - a.logz == pytest.approx(LOG_C, abs=1e-4)
    # posterior weights are scaling-invariant
    np.testing.assert_allclose(b.logw, a.logw, atol=1e-4)


def test_smc_scaling_invariance():
    from mcmcpp_tpu.smc import SMCSampler

    def run(shift, **kw):
        s = SMCSampler(log_prior, make_loglike(shift), prior_sample,
                       n_particles=512, n_params=DIM, n_mcmc=3, seed=0,
                       **kw)
        s.run()
        return s

    for kw in ({}, {"mutation": "mala"}, {"waste_free_k": 3}):
        a, b = run(0.0, **kw), run(LOG_C, **kw)
        assert b.n_stages == a.n_stages, kw
        assert b.log_evidence - a.log_evidence == pytest.approx(
            LOG_C, abs=1e-3), kw
        # trajectories agree up to float32 LSB drift (the shift changes
        # tempered-logp SUMS, and (a+s)-(b+s) != a-b at the last bit, so
        # a marginal accept can differ — near-equality is the right bar)
        np.testing.assert_allclose(a.particles, b.particles, atol=2e-4)


def test_power_pt_scaling_invariance():
    from mcmcpp_tpu.tempering import ParallelTemperingSampler, power_ladder

    def run(shift):
        pt = ParallelTemperingSampler(
            loglike_fn=make_loglike(shift), logprior_fn=log_prior,
            n_walkers=64, n_params=DIM, betas=power_ladder(6), seed=0,
        )
        pt.init_ball(np.zeros(DIM), scale=1.0, seed=1)
        pt.run_mcmc(200, thin=4)
        return pt

    a, b = run(0.0), run(LOG_C)
    np.testing.assert_allclose(a.get_samples(), b.get_samples(),
                               atol=2e-4)  # see SMC note on LSB drift
    assert (b.log_evidence("stepping_stone")
            - a.log_evidence("stepping_stone")) == pytest.approx(
        LOG_C, abs=1e-3)
    assert (b.log_evidence("ti") - a.log_evidence("ti")) == pytest.approx(
        LOG_C, abs=1e-3)


def test_bridge_scaling_invariance():
    from mcmcpp_tpu.analysis import bridge_log_evidence

    rng = np.random.default_rng(0)
    prec = 1.0 / 4.0 + 1.0
    draws = (1.0 / prec + prec**-0.5
             * rng.standard_normal((3000, DIM)))

    def logpost(shift):
        ll = make_loglike(shift)
        return lambda t: log_prior(t) + ll(t)

    a = bridge_log_evidence(logpost(0.0), draws, seed=1)
    b = bridge_log_evidence(logpost(LOG_C), draws, seed=1)
    assert a.converged and b.converged
    assert b.logz - a.logz == pytest.approx(LOG_C, abs=1e-4)
