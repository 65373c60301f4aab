"""EKI / EKS (ensemble Kalman inversion & sampler): linear-G conjugate
oracles, misfit descent, nonlinear smoke, mesh sharding.

Iglesias et al. (2013); Garbuno-Iñigo et al. (2020). For linear G the
posterior is the conjugate Gaussian — EKI must collapse onto its mean
(the regularized least-squares solution) and EKS's ensemble must match
mean AND covariance (at small dt; the O(dt) bias is documented and
measured in eks.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import (
    ensemble_kalman_inversion,
    ensemble_kalman_sampler,
)

P_DIM, E_DIM = 3, 5


@pytest.fixture(scope="module")
def linear_problem():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((E_DIM, P_DIM)).astype(np.float32)
    gamma = 0.25 * np.eye(E_DIM, dtype=np.float32)
    theta_true = np.array([0.5, -1.0, 2.0], np.float32)
    y = (a @ theta_true + 0.5 * rng.standard_normal(E_DIM)).astype(
        np.float32
    )
    c0 = 4.0 * np.eye(P_DIM, dtype=np.float32)
    gi = np.linalg.inv(gamma)
    post_cov = np.linalg.inv(a.T @ gi @ a + np.linalg.inv(c0))
    post_mean = post_cov @ (a.T @ gi @ y)
    fwd = lambda th: th @ jnp.asarray(a).T  # noqa: E731
    return fwd, y, gamma, c0, post_mean, post_cov


class TestEKI:
    def test_collapses_onto_regularized_solution(self, linear_problem):
        fwd, y, gamma, c0, post_mean, _ = linear_problem
        r = ensemble_kalman_inversion(
            jax.random.key(2), fwd, y, gamma, np.zeros(P_DIM), c0,
            n_ensemble=256, n_iters=40,
        )
        # EKI's fixed point for linear G is the posterior mean (the
        # C0-regularized least-squares solution)
        np.testing.assert_allclose(np.asarray(r.theta), post_mean,
                                   atol=0.15)
        m = np.asarray(r.misfit_trace)
        assert m[-1] < 0.05 * m[0]  # misfit collapsed
        # ensemble collapse: spread far below the posterior sd
        assert np.asarray(r.ensemble).std(axis=0).max() < 0.2

    def test_validation(self, linear_problem):
        fwd, y, gamma, c0, _, _ = linear_problem
        with pytest.raises(ValueError, match="flat"):
            ensemble_kalman_inversion(
                jax.random.key(0), fwd, np.zeros((2, 2)), gamma,
                np.zeros(P_DIM), c0,
            )
        with pytest.raises(ValueError, match="n_ensemble"):
            ensemble_kalman_inversion(
                jax.random.key(0), fwd, y, gamma, np.zeros(P_DIM), c0,
                n_ensemble=2,
            )
        with pytest.raises(ValueError, match="gamma"):
            ensemble_kalman_inversion(
                jax.random.key(0), fwd, y, np.eye(2), np.zeros(P_DIM), c0,
            )


class TestEKS:
    @pytest.mark.slow
    def test_linear_conjugate_posterior_small_dt(self, linear_problem):
        """At dt0=0.1 the O(dt) bias is ~5%: mean AND covariance must
        match the conjugate posterior."""
        fwd, y, gamma, c0, post_mean, post_cov = linear_problem
        r = ensemble_kalman_sampler(
            jax.random.key(1), fwd, y, gamma, np.zeros(P_DIM), c0,
            n_ensemble=1024, n_iters=1200, dt0=0.1,
        )
        np.testing.assert_allclose(np.asarray(r.mean), post_mean,
                                   atol=0.08)
        ratio = np.diag(np.asarray(r.cov)) / np.diag(post_cov)
        assert np.all((ratio > 0.8) & (ratio < 1.3)), ratio

    def test_defaults_recover_mean_and_spread_class(self, linear_problem):
        fwd, y, gamma, c0, post_mean, post_cov = linear_problem
        r = ensemble_kalman_sampler(
            jax.random.key(3), fwd, y, gamma, np.zeros(P_DIM), c0,
            n_ensemble=512,
        )
        np.testing.assert_allclose(np.asarray(r.mean), post_mean,
                                   atol=0.15)
        ratio = np.diag(np.asarray(r.cov)) / np.diag(post_cov)
        # documented O(dt) inflation at the 0.3 default: right CLASS,
        # not collapsed (EKI) and not the 4x prior
        assert np.all((ratio > 0.6) & (ratio < 1.6)), ratio

    def test_nonlinear_forward_runs_and_concentrates(self):
        """Mildly nonlinear G: the sampler must stay finite and land
        near the truth with sub-prior spread (no exactness claim)."""
        rng = np.random.default_rng(4)
        theta_true = np.array([0.8, -0.3], np.float32)

        def fwd(th):
            return jnp.stack(
                [th[:, 0] + 0.3 * jnp.sin(th[:, 1]),
                 th[:, 1] + 0.1 * th[:, 0] ** 2,
                 th[:, 0] * th[:, 1]], axis=1,
            )

        y = np.asarray(fwd(jnp.asarray(theta_true[None, :]))[0])
        y = (y + 0.1 * rng.standard_normal(3)).astype(np.float32)
        r = ensemble_kalman_sampler(
            jax.random.key(5), fwd, y, 0.01 * np.eye(3, dtype=np.float32),
            np.zeros(2), 4.0 * np.eye(2, dtype=np.float32),
            n_ensemble=512, n_iters=600,
        )
        assert np.isfinite(np.asarray(r.ensemble)).all()
        np.testing.assert_allclose(np.asarray(r.mean), theta_true,
                                   atol=0.3)
        assert np.asarray(r.cov).diagonal().max() < 1.0  # << prior 4.0

    def test_mesh_sharded_executes_and_agrees(self, linear_problem):
        from mcmcpp_tpu.parallel.mesh import make_walker_mesh

        fwd, y, gamma, c0, post_mean, _ = linear_problem
        kw = dict(n_ensemble=512, n_iters=100)
        a = ensemble_kalman_sampler(
            jax.random.key(6), fwd, y, gamma, np.zeros(P_DIM), c0,
            mesh=make_walker_mesh(), **kw,
        )
        b = ensemble_kalman_sampler(
            jax.random.key(6), fwd, y, gamma, np.zeros(P_DIM), c0, **kw,
        )
        assert np.isfinite(np.asarray(a.mean)).all()
        np.testing.assert_allclose(np.asarray(a.mean), np.asarray(b.mean),
                                   atol=0.1)
        np.testing.assert_allclose(np.asarray(a.mean), post_mean,
                                   atol=0.2)
