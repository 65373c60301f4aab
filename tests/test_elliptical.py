"""Elliptical slice sampling: Gaussian-prior x Gaussian-likelihood oracle
(analytic posterior), prior-reduction sanity, determinism.

Murray, Adams & MacKay (2010); no reference counterpart (SURVEY.md §4
oracle pattern; the C++ library has no prior-structure-aware kernels).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu.elliptical import EllipticalSliceSampler


DIM = 4


@pytest.fixture(scope="module")
def gp_problem():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((DIM, DIM))
    prior_cov = (a @ a.T / DIM + np.eye(DIM)).astype(np.float64)
    chol = np.linalg.cholesky(prior_cov)
    sigma2 = 0.5
    y = rng.standard_normal(DIM) * 1.5
    post_cov = np.linalg.inv(np.linalg.inv(prior_cov) + np.eye(DIM) / sigma2)
    post_mean = post_cov @ (y / sigma2)

    def loglike(f):
        return -0.5 * jnp.sum((jnp.asarray(y, jnp.float32) - f) ** 2) / sigma2

    return loglike, chol, post_mean, post_cov


class TestEllipticalSlice:
    @pytest.mark.slow
    def test_gaussian_posterior_moments(self, gp_problem):
        loglike, chol, post_mean, post_cov = gp_problem
        s = EllipticalSliceSampler(
            loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
            n_chains=64, seed=1,
        )
        s.init_prior(seed=2)
        s.run(500, thin=1)
        s.chain.clear()
        s.run(2500)
        flat = s.get_samples(flat=True)
        np.testing.assert_allclose(
            flat.mean(axis=0), post_mean,
            atol=4 * np.sqrt(post_cov.max() / 1000),
        )
        np.testing.assert_allclose(np.cov(flat.T), post_cov, atol=0.1)

    def test_constant_likelihood_reduces_to_prior(self, gp_problem):
        _, chol, _, _ = gp_problem
        prior_cov = chol @ chol.T
        s = EllipticalSliceSampler(
            lambda f: jnp.asarray(0.0), prior_mean=np.full(DIM, 2.0),
            prior_chol=chol, n_chains=64, seed=3,
        )
        s.init_prior(seed=4)
        s.run(1500)
        flat = s.get_samples(burn_in=100, flat=True)
        np.testing.assert_allclose(flat.mean(axis=0), np.full(DIM, 2.0),
                                   atol=0.15)
        np.testing.assert_allclose(np.cov(flat.T), prior_cov, atol=0.25)

    def test_diag_prior_scale_path(self):
        scales = np.array([0.5, 1.0, 2.0], np.float32)
        s = EllipticalSliceSampler(
            lambda f: jnp.asarray(0.0), prior_mean=np.zeros(3),
            prior_scale=scales, n_chains=64, seed=5,
        )
        s.init_prior(seed=6)
        s.run(1200)
        flat = s.get_samples(burn_in=100, flat=True)
        np.testing.assert_allclose(flat.std(axis=0), scales, rtol=0.1)

    def test_deterministic_given_seed(self, gp_problem):
        loglike, chol, _, _ = gp_problem

        def go():
            s = EllipticalSliceSampler(
                loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
                n_chains=8, seed=11,
            )
            s.init_prior(seed=12)
            s.run(60)
            return s.get_samples()

        np.testing.assert_array_equal(go(), go())

    def test_leftover_transitions_advance_state(self, gp_problem):
        """Round-2 advisor: run() silently discarded the n_steps % thin
        leftover transitions; it must advance the state like every other
        chunked driver (gibbs/sgmcmc/hmc)."""
        loglike, chol, _, _ = gp_problem
        s = EllipticalSliceSampler(
            loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
            n_chains=8, seed=21,
        )
        s.init_prior(seed=22)
        before = np.asarray(s.state.position).copy()
        ok = s.run(1, thin=2)  # n_store = 0, leftover = 1
        assert ok
        assert s.get_samples().shape[0] == 0
        assert not np.array_equal(np.asarray(s.state.position), before)

    def test_validation(self, gp_problem):
        loglike, chol, _, _ = gp_problem
        with pytest.raises(ValueError, match="exactly one"):
            EllipticalSliceSampler(loglike, prior_mean=np.zeros(DIM))
        with pytest.raises(ValueError, match="exactly one"):
            EllipticalSliceSampler(
                loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
                prior_scale=np.ones(DIM),
            )
        with pytest.raises(ValueError, match="prior_chol"):
            EllipticalSliceSampler(
                loglike, prior_mean=np.zeros(DIM), prior_chol=chol[:2],
            )

    def test_mesh_sharded_runs(self, gp_problem):
        loglike, chol, _, _ = gp_problem
        from mcmcpp_tpu.parallel.mesh import make_walker_mesh

        s = EllipticalSliceSampler(
            loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
            n_chains=16, seed=0, mesh=make_walker_mesh(),
        )
        s.init_prior(seed=1)
        assert s.run(40)
        assert s.get_samples().shape == (40, 16, DIM)
