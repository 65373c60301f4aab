"""Dense mass matrix (Stan dense_e analogue): metric primitives, Welford
covariance oracle, and statistical correctness of every gradient kernel
under ``metric="dense"``.

The reference is gradient-free (black-box Calculator contract,
``/root/reference/MCMCpp/Utility/UserOjbectsTest.h:144-151``); the oracle
pattern (analytic moments, MC tolerances, fixed seeds) follows SURVEY.md §4.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu.gradient import (
    BarkerSampler, CheesHMCSampler, HMCSampler, MALASampler, NUTSSampler,
)
from mcmcpp_tpu.gradient.hmc import (
    welford_covariance,
    welford_init,
    welford_update_batch,
)
from mcmcpp_tpu.gradient.metric import (
    DenseMassMatrix,
    dense_mass_from_cov,
    mass_kinetic,
    mass_momentum,
    mass_noise,
    mass_quad_inv,
    mass_velocity,
)

from tests.targets import correlated_gaussian_logp_factory


DIM = 4
RHO = 0.9  # strong correlation: where dense beats diag


def _spd(dim, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((dim, dim))
    return (a @ a.T + dim * np.eye(dim)).astype(np.float32)


class TestPrimitives:
    """The four linear-map primitives against direct linear algebra."""

    def setup_method(self):
        self.cov = _spd(5, seed=3)
        self.m = dense_mass_from_cov(self.cov)
        self.prec = np.linalg.inv(np.asarray(self.m.cov, np.float64))

    def test_factorization(self):
        chol = np.asarray(self.m.chol, np.float64)
        np.testing.assert_allclose(
            chol @ chol.T, np.asarray(self.m.cov, np.float64), rtol=1e-5
        )
        ict = np.asarray(self.m.inv_chol_t, np.float64)
        np.testing.assert_allclose(
            ict.T @ chol, np.eye(5), atol=1e-4
        )

    def test_velocity_is_cov_matvec(self):
        p = np.arange(5.0, dtype=np.float32)
        np.testing.assert_allclose(
            mass_velocity(self.m, p), self.cov @ p, rtol=1e-5
        )

    def test_kinetic_is_half_quadratic_form(self):
        p = np.linspace(-1, 1, 5).astype(np.float32)
        np.testing.assert_allclose(
            mass_kinetic(self.m, p), 0.5 * p @ self.cov @ p, rtol=1e-5
        )

    def test_momentum_map_has_precision_covariance(self):
        # A = L⁻ᵀ satisfies AAᵀ = Σ⁻¹ exactly — check algebraically
        a = np.asarray(self.m.inv_chol_t, np.float64)
        np.testing.assert_allclose(a @ a.T, self.prec, rtol=1e-3)

    def test_noise_map_has_cov_covariance(self):
        li = np.asarray(self.m.chol, np.float64)
        np.testing.assert_allclose(
            li @ li.T, np.asarray(self.cov, np.float64), rtol=1e-5
        )

    def test_quad_inv(self):
        d = np.linspace(0.5, 2.5, 5).astype(np.float32)
        np.testing.assert_allclose(
            mass_quad_inv(self.m, d), d @ self.prec @ d, rtol=1e-4
        )

    def test_batched_shapes(self):
        p = np.random.default_rng(0).standard_normal((7, 5)).astype(np.float32)
        v = mass_velocity(self.m, p)
        assert v.shape == (7, 5)
        np.testing.assert_allclose(v, p @ self.cov.T, rtol=1e-4)
        k = mass_kinetic(self.m, p)
        assert k.shape == (7,)
        np.testing.assert_allclose(
            k, 0.5 * np.einsum("ci,ij,cj->c", p, self.cov, p), rtol=1e-4
        )

    def test_diag_paths_unchanged(self):
        im = jnp.asarray([0.5, 2.0, 4.0], jnp.float32)
        p = jnp.asarray([1.0, -2.0, 3.0], jnp.float32)
        np.testing.assert_allclose(mass_velocity(im, p), im * p)
        np.testing.assert_allclose(
            mass_kinetic(im, p), 0.5 * jnp.sum(im * p * p)
        )
        np.testing.assert_allclose(
            mass_momentum(im, p), p / jnp.sqrt(im), rtol=1e-6
        )
        np.testing.assert_allclose(mass_noise(im, p), p * jnp.sqrt(im))
        np.testing.assert_allclose(
            mass_quad_inv(im, p), jnp.sum(p * p / im)
        )


class TestWelfordCovariance:
    def test_matches_numpy_cov(self):
        rng = np.random.default_rng(1)
        chol = np.linalg.cholesky(_spd(3, seed=7))
        x = (rng.standard_normal((4096, 3)) @ chol.T).astype(np.float32)
        w = welford_init((3, 3), jnp.float32)
        for i in range(0, 4096, 256):  # batched folds, like warmup
            w = welford_update_batch(w, jnp.asarray(x[i:i + 256]))
        got = np.asarray(welford_covariance(w, regularize=False))
        np.testing.assert_allclose(got, np.cov(x.T), rtol=0.02, atol=0.02)

    def test_regularization_shrinks_to_identity_floor(self):
        w = welford_init((3, 3), jnp.float32)
        cov = np.asarray(welford_covariance(w))
        np.testing.assert_allclose(cov, 1e-3 * np.eye(3), atol=1e-6)


def _target():
    logp, cov = correlated_gaussian_logp_factory(dim=DIM, rho=RHO)
    return logp, np.asarray(cov)


def _run(cls, seed=0, warmup=500, steps=1500, **kw):
    logp, cov = _target()
    s = cls(logp, n_chains=32, n_params=DIM, seed=seed, metric="dense", **kw)
    s.init_ball(np.zeros(DIM), scale=1.0, seed=seed + 1)
    s.warmup(warmup)
    s.run(steps)
    return s, cov


class TestDenseSamplers:
    @pytest.mark.slow
    @pytest.mark.parametrize("cls,kw", [
        (HMCSampler, {"n_leapfrog": 12}),
        (MALASampler, {}),
        (BarkerSampler, {}),
        (NUTSSampler, {"max_depth": 8}),
        (CheesHMCSampler, {}),
    ])
    def test_moments(self, cls, kw):
        s, cov = _run(cls, **kw)
        flat = s.get_samples(burn_in=100, flat=True)
        np.testing.assert_allclose(flat.mean(axis=0), np.zeros(DIM), atol=0.15)
        np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.3)

    @pytest.mark.slow
    def test_warmup_learns_the_covariance(self):
        s, cov = _run(HMCSampler, n_leapfrog=12, warmup=800, steps=10)
        assert isinstance(s.inv_mass, DenseMassMatrix)
        got = np.asarray(s.inv_mass.cov)
        # off-diagonal structure recovered: ρ=0.9 correlations present
        corr = got / np.sqrt(np.outer(np.diag(got), np.diag(got)))
        true_corr = cov / np.sqrt(np.outer(np.diag(cov), np.diag(cov)))
        np.testing.assert_allclose(corr, true_corr, atol=0.25)

    @pytest.mark.slow
    def test_dense_beats_diag_step_size_on_correlated_target(self):
        """The point of dense_e: after whitening, the integrator tolerates
        a much larger step on a strongly correlated target."""
        logp, _ = _target()

        def fit(metric):
            s = HMCSampler(logp, n_chains=32, n_params=DIM, seed=0,
                           n_leapfrog=12, metric=metric)
            s.init_ball(np.zeros(DIM), scale=1.0, seed=1)
            s.warmup(800)
            return float(np.mean(np.asarray(s.step_size)))

        assert fit("dense") > 1.5 * fit("diag")

    def test_deterministic_given_seed(self):
        logp, _ = _target()

        def go():
            s = HMCSampler(logp, n_chains=8, n_params=DIM, seed=11,
                           n_leapfrog=8, metric="dense")
            s.init_ball(np.zeros(DIM), scale=0.5, seed=12)
            s.warmup(50)
            s.run(50)
            return s.get_samples()

        np.testing.assert_array_equal(go(), go())

    def test_metric_validation(self):
        logp, _ = _target()
        with pytest.raises(ValueError, match="metric must be"):
            HMCSampler(logp, n_chains=4, n_params=DIM, metric="full")

    def test_adapt_mass_false_keeps_identity(self):
        logp, _ = _target()
        s = HMCSampler(logp, n_chains=8, n_params=DIM, seed=3,
                       n_leapfrog=8, metric="dense")
        s.init_ball(np.zeros(DIM), scale=0.5, seed=4)
        s.warmup(30, adapt_mass=False)
        np.testing.assert_array_equal(
            np.asarray(s.inv_mass.cov), np.eye(DIM, dtype=np.float32)
        )
