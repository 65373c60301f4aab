"""pCN (preconditioned Crank-Nicolson): conjugate-posterior oracle,
dimension-robust acceptance (the defining property), prior reduction,
mesh parity, checkpoint resume.

Cotter, Roberts, Stuart & White (2013); no reference counterpart
(SURVEY.md §4 oracle pattern; the C++ library has no
prior-structure-aware kernels).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import PCNSampler


DIM = 4


@pytest.fixture(scope="module")
def gauss_problem():
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


def _gp_chol(p):
    """RBF-kernel GP prior on a [0, 1] grid of p points (f64 Cholesky
    host-side, cast down — the f32 factorization is ill-conditioned)."""
    x = np.linspace(0.0, 1.0, p)
    k = np.exp(-0.5 * ((x[:, None] - x[None, :]) / 0.2) ** 2)
    return np.linalg.cholesky(k + 1e-6 * np.eye(p))


class TestPCN:
    @pytest.mark.slow
    def test_gaussian_posterior_moments(self, gauss_problem):
        loglike, chol, post_mean, post_cov = gauss_problem
        s = PCNSampler(
            loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
            beta=0.35, n_chains=64, seed=1,
        )
        s.init_prior(seed=2)
        s.run(1000)
        s.chain.clear()
        s.run(6000, thin=2)
        flat = s.get_samples(flat=True)
        np.testing.assert_allclose(
            flat.mean(axis=0), post_mean,
            atol=5 * np.sqrt(post_cov.max() / 1000),
        )
        np.testing.assert_allclose(np.cov(flat.T), post_cov, atol=0.12)
        assert 0.1 < s.acceptance_fraction < 0.9

    def test_acceptance_dimension_robust(self):
        """THE pCN property (Cotter et al. 2013 §4): with a fixed beta
        and a likelihood of fixed information content, acceptance stays
        flat as the GP discretization refines P=64 -> P=1024 (a
        random-walk kernel's would collapse ~exp(-c P beta^2))."""
        rates = {}
        for p in (64, 1024):
            chol = _gp_chol(p)

            def loglike(f):
                # finite-rank observation: noisy average of the field
                return -0.5 * jnp.square(jnp.mean(f) - 0.7) / 0.01

            s = PCNSampler(
                loglike, prior_mean=np.zeros(p), prior_chol=chol,
                beta=0.3, n_chains=64, seed=3,
            )
            s.init_prior(seed=4)
            s.run(600)
            rates[p] = s.acceptance_fraction
        assert 0.15 < rates[64] < 0.95
        assert 0.15 < rates[1024] < 0.95
        assert abs(rates[64] - rates[1024]) < 0.08, rates

    def test_beta_one_is_prior_independence_sampler(self, gauss_problem):
        """beta=1 with a constant likelihood draws iid from the prior."""
        _, chol, _, _ = gauss_problem
        prior_cov = chol @ chol.T
        s = PCNSampler(
            lambda f: jnp.asarray(0.0), prior_mean=np.full(DIM, 2.0),
            prior_chol=chol, beta=1.0, n_chains=64, seed=5,
        )
        s.init_prior(seed=6)
        s.run(400)
        flat = s.get_samples(burn_in=50, flat=True)
        np.testing.assert_allclose(flat.mean(axis=0), 2.0, atol=0.1)
        np.testing.assert_allclose(np.cov(flat.T), prior_cov, atol=0.15)
        # constant likelihood => every proposal accepted
        assert s.acceptance_fraction == 1.0

    def test_mesh_parity_ulp(self, gauss_problem):
        """Sharded run == unsharded run to ULP tolerance: the
        (C, P) x (P, P) prior-Cholesky matmul's reduction order differs
        per shard shape (same convention as the LGSS mesh-parity tests);
        everything else in the kernel is elementwise/branchless."""
        loglike, chol, _, _ = gauss_problem
        from mcmcpp_tpu.parallel.mesh import make_walker_mesh

        def build(mesh):
            s = PCNSampler(
                loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
                beta=0.4, n_chains=16, seed=7, mesh=mesh,
            )
            s.init_prior(seed=8)
            s.run(30)
            return s

        a = build(make_walker_mesh())
        b = build(None)
        np.testing.assert_allclose(
            a.get_samples(), b.get_samples(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            a.get_log_likes(), b.get_log_likes(), rtol=1e-5, atol=1e-6
        )

    def test_checkpoint_resume_bitwise(self, gauss_problem, tmp_path):
        from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        loglike, chol, _, _ = gauss_problem

        def build(seed=11):
            return PCNSampler(
                loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
                beta=0.4, n_chains=16, seed=seed,
            )

        a = build()
        a.init_prior(seed=12)
        a.run(25)
        ckpt = save_checkpoint(a, tmp_path / "pcn.npz")
        a.run(25)

        b = build(seed=99)
        b.init_prior(seed=13)
        load_checkpoint(b, ckpt)
        b.run(25)
        np.testing.assert_array_equal(a.get_samples(), b.get_samples())
        np.testing.assert_array_equal(a.get_log_likes(), b.get_log_likes())
        assert a.total_steps == b.total_steps
        assert a.acceptance_fraction == b.acceptance_fraction

    def test_checkpoint_carries_tuned_beta(self, gauss_problem, tmp_path):
        from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        loglike, chol, _, _ = gauss_problem
        a = PCNSampler(loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
                       beta=1.0, n_chains=16, seed=31)
        a.init_prior(seed=32)
        a.tune(n_steps=200, window=20)
        ckpt = save_checkpoint(a, tmp_path / "pcn_tuned.npz")
        b = PCNSampler(loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
                       beta=1.0, n_chains=16, seed=99)
        b.init_prior(seed=33)
        load_checkpoint(b, ckpt)
        assert b.beta == a.beta != 1.0

    def test_validation(self, gauss_problem):
        loglike, chol, _, _ = gauss_problem
        with pytest.raises(ValueError, match="beta"):
            PCNSampler(loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
                       beta=0.0)
        with pytest.raises(ValueError, match="beta"):
            PCNSampler(loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
                       beta=1.5)
        with pytest.raises(ValueError, match="exactly one"):
            PCNSampler(loglike, prior_mean=np.zeros(DIM))
        with pytest.raises(ValueError, match="exactly one"):
            PCNSampler(loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
                       prior_scale=np.ones(DIM))
        with pytest.raises(ValueError, match="prior_chol"):
            PCNSampler(loglike, prior_mean=np.zeros(DIM),
                       prior_chol=chol[:2])
        with pytest.raises(RuntimeError, match="init"):
            PCNSampler(loglike, prior_mean=np.zeros(DIM),
                       prior_chol=chol).run(5)


class TestPCNTune:
    def test_tune_reaches_target_band_and_freezes(self, gauss_problem):
        """Robbins-Monro beta adaptation: from a far-too-large start the
        acceptance must land near the target and the tuned beta must be
        frozen through the sampling phase (exactness argument)."""
        loglike, chol, post_mean, post_cov = gauss_problem
        s = PCNSampler(
            loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
            beta=1.0, n_chains=64, seed=21,
        )
        s.init_prior(seed=22)
        s.tune(n_steps=800, target=0.3, window=20)
        assert s.beta < 1.0
        beta_frozen = s.beta
        assert s.total_steps == 0  # tune steps don't count
        s.run(1200)
        assert s.beta == beta_frozen
        assert 0.15 < s.acceptance_fraction < 0.5, s.acceptance_fraction
        # and the post-tune chain still matches the conjugate oracle
        flat = s.get_samples(burn_in=200, flat=True)
        np.testing.assert_allclose(flat.mean(axis=0), post_mean, atol=0.2)

    def test_tune_raises_uninitialized_and_bad_target(self, gauss_problem):
        loglike, chol, _, _ = gauss_problem
        s = PCNSampler(loglike, prior_mean=np.zeros(DIM), prior_chol=chol)
        with pytest.raises(RuntimeError, match="init"):
            s.tune()
        s.init_prior(seed=23)
        with pytest.raises(ValueError, match="target"):
            s.tune(target=1.5)

    def test_post_tune_run_uses_fresh_program(self, gauss_problem):
        """The run cache is keyed on beta: a run BEFORE tune must not
        leak its stale-beta executable into the run AFTER tune (the
        acceptance under the old program would silently stay at the
        old beta's rate)."""
        loglike, chol, _, _ = gauss_problem
        s = PCNSampler(
            loglike, prior_mean=np.zeros(DIM), prior_chol=chol,
            beta=1.0, n_chains=64, seed=24,
        )
        s.init_prior(seed=25)
        s.run(50)          # populates the cache at beta=1.0
        acc_before = s.acceptance_fraction
        s.chain.clear()
        s.tune(n_steps=400, target=0.3, window=20)
        s.run(400)
        assert s.beta != 1.0
        assert s.acceptance_fraction > acc_before + 0.05
