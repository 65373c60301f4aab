"""Pathfinder (Zhang et al. 2022): L-BFGS-path variational inference.

Oracles: Gaussian targets with analytic moments (SURVEY.md §4 pattern);
no reference counterpart (derivative-free Calculator,
``/root/reference/MCMCpp/Utility/UserOjbectsTest.h:144-151``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import multi_pathfinder, pathfinder

from tests.targets import correlated_gaussian_logp_factory


DIM = 4


@pytest.fixture(scope="module")
def gauss():
    logp, cov = correlated_gaussian_logp_factory(dim=DIM, rho=0.6)
    return logp, np.asarray(cov)


class TestSinglePath:
    def test_gaussian_recovers_mean_and_cov(self, gauss):
        logp, cov = gauss
        r = pathfinder(logp, np.full(DIM, 3.0), maxiter=40, n_draws=4000,
                       seed=0)
        # mode found
        np.testing.assert_allclose(np.asarray(r.mean), np.zeros(DIM),
                                   atol=0.05)
        # for a Gaussian target the L-BFGS inverse Hessian converges to the
        # true covariance: draw moments must match it
        d = np.asarray(r.draws)
        np.testing.assert_allclose(d.mean(axis=0), np.zeros(DIM), atol=0.1)
        np.testing.assert_allclose(np.cov(d.T), cov, atol=0.25)
        # importance weights well-behaved (the approximation family
        # contains the target; backtracking BFGS gets close, not exact)
        lw = np.asarray(r.logw, np.float64)
        assert lw.std() < 1.5

    def test_elbo_improves_along_path(self, gauss):
        logp, _ = gauss
        r = pathfinder(logp, np.full(DIM, 5.0), maxiter=40, seed=1)
        e = np.asarray(r.elbo_history)
        finite = e[np.isfinite(e)]
        assert finite[-1] > finite[0] + 1.0  # late iterates beat early ones
        assert int(r.best_iter) > 0

    def test_badly_scaled_target(self):
        scales = np.array([0.05, 1.0, 20.0], np.float32)

        def logp(t):
            return -0.5 * jnp.sum((t / scales) ** 2)

        r = pathfinder(logp, np.ones(3) * 2.0, maxiter=60, n_draws=4000,
                       seed=2)
        d = np.asarray(r.draws)
        np.testing.assert_allclose(d.std(axis=0), scales, rtol=0.35)

    def test_deterministic_given_seed(self, gauss):
        logp, _ = gauss
        a = pathfinder(logp, np.ones(DIM), seed=7)
        b = pathfinder(logp, np.ones(DIM), seed=7)
        np.testing.assert_array_equal(np.asarray(a.draws),
                                      np.asarray(b.draws))

    def test_path_logp_increases(self, gauss):
        logp, _ = gauss
        r = pathfinder(logp, np.full(DIM, 4.0), maxiter=40, seed=3)
        lp = np.asarray(r.path_logp)
        assert lp[-1] >= lp[0]  # monotone accept rule
        assert np.all(np.diff(lp) >= -1e-5)


class TestMultiPath:
    def test_pooled_draws_and_khat(self, gauss):
        logp, cov = gauss
        r = multi_pathfinder(logp, n_paths=4, init=np.zeros(DIM),
                             init_scale=2.0, n_draws=3000, seed=0)
        assert r.draws.shape == (3000, DIM)
        assert r.paths.draws.shape[0] == 4
        np.testing.assert_allclose(r.draws.mean(axis=0), np.zeros(DIM),
                                   atol=0.1)
        np.testing.assert_allclose(np.cov(r.draws.T), cov, atol=0.3)
        assert r.pareto_k < 0.7  # exact family: well-behaved weights

    def test_mesh_sharded_paths(self, gauss):
        """Path axis sharded over the 8-device CPU mesh: paths are fully
        independent, so the sharded run must recover the same posterior
        (statistical check) and be deterministic across mesh runs."""
        from mcmcpp_tpu.parallel.mesh import make_walker_mesh

        logp, cov = gauss
        mesh = make_walker_mesh()
        kw = dict(n_paths=8, init=np.zeros(DIM), init_scale=2.0,
                  n_draws=3000, seed=0)
        a = multi_pathfinder(logp, mesh=mesh, **kw)
        b = multi_pathfinder(logp, mesh=mesh, **kw)
        np.testing.assert_array_equal(a.draws, b.draws)  # deterministic
        assert a.draws.shape == (3000, DIM)
        np.testing.assert_allclose(a.draws.mean(axis=0), np.zeros(DIM),
                                   atol=0.1)
        np.testing.assert_allclose(np.cov(a.draws.T), cov, atol=0.3)
        assert a.pareto_k < 0.7

    def test_initializes_nuts_chains(self, gauss):
        """The advertised use: Pathfinder draws as MCMC inits."""
        from mcmcpp_tpu import NUTSSampler

        logp, cov = gauss
        r = multi_pathfinder(logp, n_paths=4, init=np.full(DIM, 3.0),
                             n_draws=16, seed=1)
        s = NUTSSampler(logp, n_chains=16, n_params=DIM, seed=2, max_depth=6)
        s.init(r.draws)
        s.warmup(100)
        s.run(300)
        flat = s.get_samples(flat=True)
        np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.3)

    def test_explicit_starts_validation(self, gauss):
        logp, _ = gauss
        with pytest.raises(ValueError, match="n_paths"):
            multi_pathfinder(logp, n_paths=3,
                             init=np.zeros((2, DIM)))
