"""SGLD / SGHMC: minibatch stochastic-gradient MCMC oracles.

Conjugate Gaussian target with ANALYTIC posterior: y_i ~ N(theta, sigma2 I),
theta ~ N(0, tau2 I); posterior precision 1/tau2 + N/sigma2. The samplers
are uncorrected (bias O(step_size)), so tolerances are wider than the
exact-MCMC oracles but tight enough to catch wrong N/B scaling, wrong
noise variance, or a broken schedule (SURVEY.md §4 oracle pattern; no
reference counterpart — gradient-free Calculator,
``/root/reference/MCMCpp/Utility/UserOjbectsTest.h:144-151``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import SGHMCSampler, SGLDSampler


DIM = 3
N_DATA = 2048
SIGMA2 = 1.0
TAU2 = 1.0


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    theta_true = np.array([0.5, -0.3, 0.2], np.float32)
    y = (theta_true + rng.standard_normal((N_DATA, DIM))).astype(np.float32)
    prec = 1.0 / TAU2 + N_DATA / SIGMA2
    post_mean = (y.sum(axis=0) / SIGMA2) / prec
    post_var = 1.0 / prec

    def logprior(t):
        return -0.5 * jnp.sum(t * t) / TAU2

    def loglike(t, batch):
        d = batch - t[None, :]
        return -0.5 * jnp.sum(d * d) / SIGMA2

    return logprior, loglike, {"y": y}, post_mean, post_var


def _check_moments(s, post_mean, post_var, burn):
    flat = s.get_samples(burn_in=burn, flat=True)
    np.testing.assert_allclose(
        flat.mean(axis=0), post_mean, atol=4 * np.sqrt(post_var)
    )
    ratio = flat.var(axis=0) / post_var
    assert np.all(ratio > 0.5) and np.all(ratio < 2.5), ratio


class TestSGLD:
    @pytest.mark.slow
    def test_posterior_moments(self, problem):
        logprior, loglike, data, post_mean, post_var = problem
        s = SGLDSampler(logprior, loglike, data["y"], n_chains=16,
                        n_params=DIM, batch_size=256, seed=1,
                        step_size=2e-5)
        s.init_ball(np.zeros(DIM), scale=0.1, seed=2)
        s.run(4000)
        _check_moments(s, post_mean, post_var, burn=1000)

    def test_decay_schedule(self, problem):
        logprior, loglike, data, *_ = problem
        s = SGLDSampler(logprior, loglike, data["y"], n_chains=8,
                        n_params=DIM, batch_size=128, seed=1,
                        step_size=1e-4, step_size_decay=(100.0, 0.55))
        e0 = float(s._eps_at(jnp.int32(0)))
        e1k = float(s._eps_at(jnp.int32(1000)))
        assert abs(e0 - 1e-4) < 1e-9
        assert abs(e1k - 1e-4 * 11.0 ** -0.55) / e1k < 1e-4
        s.init_ball(np.zeros(DIM), scale=0.1, seed=2)
        assert s.run(50)
        assert s.get_samples().shape == (50, 8, DIM)

    def test_deterministic_given_seed(self, problem):
        logprior, loglike, data, *_ = problem

        def go():
            s = SGLDSampler(logprior, loglike, data["y"], n_chains=8,
                            n_params=DIM, batch_size=64, seed=7,
                            step_size=1e-4)
            s.init_ball(np.zeros(DIM), scale=0.1, seed=8)
            s.run(40)
            return s.get_samples()

        np.testing.assert_array_equal(go(), go())

    def test_validation(self, problem):
        logprior, loglike, data, *_ = problem
        with pytest.raises(ValueError, match="batch_size"):
            SGLDSampler(logprior, loglike, data["y"], n_chains=8,
                        n_params=DIM, batch_size=0)
        with pytest.raises(ValueError, match="step_size_decay"):
            SGLDSampler(logprior, loglike, data["y"], n_chains=8,
                        n_params=DIM, batch_size=64,
                        step_size_decay=(0.0, 0.5))
        with pytest.raises(ValueError, match="disagree"):
            SGLDSampler(logprior, loglike,
                        {"a": data["y"], "b": data["y"][:5]},
                        n_chains=8, n_params=DIM, batch_size=4)

    def test_logp_estimate_tracks_full_logp(self, problem):
        """The stored minibatch estimate must be an unbiased estimate of
        prior + full-data loglike (catches a wrong N/B scale)."""
        logprior, loglike, data, *_ = problem
        s = SGLDSampler(logprior, loglike, data["y"], n_chains=8,
                        n_params=DIM, batch_size=256, seed=3,
                        step_size=1e-10)  # ~frozen theta: isolate the estimate
        theta = np.full((8, DIM), 0.45, np.float32)
        s.init(theta)
        s.run(300)
        full = float(logprior(jnp.asarray(theta[0]))
                     + loglike(jnp.asarray(theta[0]), jnp.asarray(data["y"])))
        est = s.get_log_probs().mean()
        assert abs(est - full) / abs(full) < 0.02


class TestSGHMC:
    @pytest.mark.slow
    def test_posterior_moments(self, problem):
        logprior, loglike, data, post_mean, post_var = problem
        s = SGHMCSampler(logprior, loglike, data["y"], n_chains=16,
                         n_params=DIM, batch_size=256, seed=1,
                         step_size=1e-5, friction=0.1)
        s.init_ball(np.zeros(DIM), scale=0.1, seed=2)
        s.run(4000)
        _check_moments(s, post_mean, post_var, burn=1000)

    def test_friction_validation(self, problem):
        logprior, loglike, data, *_ = problem
        with pytest.raises(ValueError, match="friction"):
            SGHMCSampler(logprior, loglike, data["y"], n_chains=8,
                         n_params=DIM, batch_size=64, friction=0.0)

    def test_mesh_sharded_runs(self, problem):
        logprior, loglike, data, *_ = problem
        from mcmcpp_tpu.parallel.mesh import make_walker_mesh

        s = SGHMCSampler(logprior, loglike, data["y"], n_chains=16,
                         n_params=DIM, batch_size=64, seed=0,
                         step_size=1e-5, mesh=make_walker_mesh())
        s.init_ball(np.zeros(DIM), scale=0.1, seed=1)
        assert s.run(30)
        assert s.get_samples().shape == (30, 16, DIM)
