"""MEADS (Hoffman & Sountsov 2022): cross-fold adaptive generalized HMC.

Oracle pattern per SURVEY.md §4 (analytic moments, MC tolerances, fixed
seeds); the reference has no gradient samplers (black-box Calculator,
``/root/reference/MCMCpp/Utility/UserOjbectsTest.h:144-151``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import MEADSSampler
from mcmcpp_tpu.gradient.meads import max_eig_cov

from tests.targets import correlated_gaussian_logp_factory


DIM = 4
RHO = 0.5


class TestMaxEig:
    def test_matches_eigvalsh(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((5, 5))
        cov = a @ a.T + np.eye(5)
        chol = np.linalg.cholesky(cov)
        x = (rng.standard_normal((8192, 5)) @ chol.T).astype(np.float32)
        got = float(max_eig_cov(jnp.asarray(x)))
        want = np.linalg.eigvalsh(np.cov(x.T)).max()
        assert abs(got - want) / want < 0.02

    def test_degenerate_batch_is_finite(self):
        x = jnp.ones((16, 3), jnp.float32)  # zero covariance
        assert float(max_eig_cov(x)) == 0.0


def _run(seed=0, burn=500, steps=2000, n_chains=64, **kw):
    logp, cov = correlated_gaussian_logp_factory(dim=DIM, rho=RHO)
    s = MEADSSampler(logp, n_chains=n_chains, n_params=DIM, seed=seed, **kw)
    s.init_ball(np.zeros(DIM), scale=1.0, seed=seed + 1)
    s.warmup(burn)
    s.run(steps)
    return s, np.asarray(cov)


class TestMEADS:
    @pytest.mark.slow
    def test_moments(self):
        s, cov = _run()
        flat = s.get_samples(burn_in=200, flat=True)
        np.testing.assert_allclose(flat.mean(axis=0), np.zeros(DIM), atol=0.1)
        np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.25)

    @pytest.mark.slow
    def test_badly_scaled_target_preconditioned(self):
        """Per-dim scales spanning 100x: the cross-fold sd preconditioner
        must absorb them (a fixed-metric one-step GHMC would stall)."""
        scales = np.array([0.1, 1.0, 10.0], np.float32)

        def logp(t):
            return -0.5 * jnp.sum((t / scales) ** 2)

        s = MEADSSampler(logp, n_chains=64, n_params=3, seed=2)
        s.init_ball(np.zeros(3), scale=0.5, seed=3)
        s.warmup(800)
        s.run(3000)
        flat = s.get_samples(burn_in=500, flat=True)
        np.testing.assert_allclose(
            flat.std(axis=0), scales, rtol=0.2
        )
        assert s.last_mean_accept > 0.5

    def test_acceptance_healthy(self):
        s, _ = _run(steps=300)
        # eps at half the leapfrog stability limit: acceptance should be high
        assert s.last_mean_accept > 0.6

    def test_deterministic_given_seed(self):
        def go():
            s, _ = _run(seed=7, burn=50, steps=80, n_chains=16)
            return s.get_samples()

        np.testing.assert_array_equal(go(), go())

    def test_validation(self):
        logp, _ = correlated_gaussian_logp_factory(dim=DIM, rho=RHO)
        with pytest.raises(ValueError, match="not divisible"):
            MEADSSampler(logp, n_chains=30, n_params=DIM, n_folds=4)
        with pytest.raises(ValueError, match=">= 4 chains per fold"):
            MEADSSampler(logp, n_chains=8, n_params=DIM, n_folds=4)

    def test_mesh_sharded_runs(self):
        logp, _ = correlated_gaussian_logp_factory(dim=DIM, rho=RHO)
        from mcmcpp_tpu.parallel.mesh import make_walker_mesh

        mesh = make_walker_mesh()
        s = MEADSSampler(logp, n_chains=64, n_params=DIM, seed=0, mesh=mesh)
        s.init_ball(np.zeros(DIM), scale=1.0, seed=1)
        s.warmup(20)
        s.run(40)
        assert s.get_samples().shape == (40, 64, DIM)
