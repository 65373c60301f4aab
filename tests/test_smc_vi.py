"""SMC and ADVI correctness against analytic targets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu.smc import SMCSampler, systematic_resample, ess_from_log_weights
from mcmcpp_tpu.vi import ADVI


def test_systematic_resample_unbiased():
    key = jax.random.key(0)
    log_w = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    counts = np.zeros(4)
    for i in range(200):
        idx = systematic_resample(jax.random.fold_in(key, i), log_w, 400)
        counts += np.bincount(np.asarray(idx), minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.01)


def test_ess_uniform_weights():
    log_w = jnp.zeros(100)
    assert float(ess_from_log_weights(log_w)) == pytest.approx(100.0, rel=1e-5)


def test_smc_gaussian_posterior_and_evidence():
    """Prior N(0, 2²I), likelihood N(1, 1²I) in 2-D: conjugate ground truth.

    Posterior: N(mu_n, s²I) with s² = 1/(1/4+1), mu_n = s²·(1·1/1 + 0/4).
    Evidence per dim: N(1 | 0, sqrt(4+1)) marginal.
    """
    dim = 2
    s2 = 1.0 / (1.0 / 4.0 + 1.0)
    mu_n = s2 * 1.0
    logz_true = dim * (-0.5 * np.log(2 * np.pi * 5.0) - 0.5 * 1.0 / 5.0)

    def log_prior(t):
        return -0.5 * jnp.sum(t**2) / 4.0 - dim / 2 * jnp.log(2 * jnp.pi * 4.0)

    def log_like(t):
        return -0.5 * jnp.sum((t - 1.0) ** 2) - dim / 2 * jnp.log(2 * jnp.pi)

    def prior_sample(key, n):
        return 2.0 * jax.random.normal(key, (n, dim))

    s = SMCSampler(log_prior, log_like, prior_sample,
                   n_particles=2048, n_params=dim, n_mcmc=5, seed=0)
    s.run()
    assert float(s.state.beta) == 1.0
    p = s.particles
    np.testing.assert_allclose(p.mean(axis=0), [mu_n, mu_n], atol=0.08)
    np.testing.assert_allclose(p.var(axis=0), [s2, s2], atol=0.1)
    assert s.log_evidence == pytest.approx(logz_true, abs=0.15)
    # adaptive ladder must be monotone in (0, 1]
    assert all(b2 > b1 for b1, b2 in zip(s.beta_ladder, s.beta_ladder[1:]))


@pytest.mark.parametrize("full_rank", [False, True])
def test_advi_recovers_gaussian(full_rank):
    cov = np.array([[1.0, 0.6], [0.6, 1.0]], np.float32)
    prec = jnp.asarray(np.linalg.inv(cov))
    mean = jnp.asarray([1.0, -2.0])

    def logp(t):
        d = t - mean
        return -0.5 * d @ (prec @ d)

    vi = ADVI(logp, n_params=2, full_rank=full_rank, n_mc=32,
              learning_rate=0.05, seed=0)
    vi.fit(2000)
    np.testing.assert_allclose(vi.mean, [1.0, -2.0], atol=0.1)
    if full_rank:
        np.testing.assert_allclose(vi.cov, cov, atol=0.15)
    else:  # mean-field matches marginal precisions, not covariances
        assert vi.cov[0, 1] == 0.0
        np.testing.assert_allclose(
            np.diag(vi.cov), 1.0 / np.diag(np.linalg.inv(cov)), atol=0.12
        )
    # ELBO should have improved and converged
    t = vi.elbo_trace
    assert np.mean(t[-100:]) > np.mean(t[:100])


def test_advi_mesh_sharded_matches_unsharded():
    """MC-sample axis sharded over the 8-device CPU mesh: params stay
    replicated and only the ELBO mean's reduction order changes, so the
    fitted variational params must match the unsharded fit to float
    tolerance (and the analytic posterior within it)."""
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    cov = np.array([[1.0, 0.6], [0.6, 1.0]], np.float32)
    prec = jnp.asarray(np.linalg.inv(cov))
    mean = jnp.asarray([1.0, -2.0])

    def logp(t):
        d = t - mean
        return -0.5 * d @ (prec @ d)

    kw = dict(n_params=2, full_rank=True, n_mc=32, learning_rate=0.05,
              seed=0)
    a = ADVI(logp, **kw).fit(800)
    b = ADVI(logp, mesh=make_walker_mesh(), **kw).fit(800)
    np.testing.assert_allclose(b.mean, a.mean, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(b.cov, a.cov, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(b.mean, [1.0, -2.0], atol=0.1)


def test_advi_sample_shape():
    vi = ADVI(lambda t: -0.5 * jnp.sum(t**2), n_params=3, seed=1)
    vi.fit(200)
    s = vi.sample(64)
    assert s.shape == (64, 3)


class TestWasteFreeSMC:
    """Dau & Chopin 2022 waste-free mode: intermediate MCMC states are
    particles (ROADMAP capability item; no reference counterpart)."""

    @staticmethod
    def _conjugate():
        dim = 2
        s2 = 1.0 / (1.0 / 4.0 + 1.0)
        mu_n = s2 * 1.0
        logz = dim * (-0.5 * np.log(2 * np.pi * 5.0) - 0.5 * 1.0 / 5.0)

        def log_prior(t):
            return (-0.5 * jnp.sum(t**2) / 4.0
                    - dim / 2 * jnp.log(2 * jnp.pi * 4.0))

        def log_like(t):
            return (-0.5 * jnp.sum((t - 1.0) ** 2)
                    - dim / 2 * jnp.log(2 * jnp.pi))

        def prior_sample(key, n):
            return 2.0 * jax.random.normal(key, (n, dim))

        return dim, mu_n, s2, logz, log_prior, log_like, prior_sample

    def test_posterior_and_evidence(self):
        dim, mu_n, s2, logz, lp, ll, ps = self._conjugate()
        s = SMCSampler(lp, ll, ps, n_particles=2048, n_params=dim,
                       waste_free_k=7, seed=0)  # M = 256 seeds/stage
        s.run()
        assert float(s.state.beta) == 1.0
        p = s.particles
        assert p.shape == (2048, dim)
        np.testing.assert_allclose(p.mean(axis=0), [mu_n, mu_n], atol=0.08)
        np.testing.assert_allclose(p.var(axis=0), [s2, s2], atol=0.1)
        assert s.log_evidence == pytest.approx(logz, abs=0.2)
        assert all(b2 > b1 for b1, b2 in zip(s.beta_ladder, s.beta_ladder[1:]))

    def test_particles_are_diverse(self):
        """The union must not be K+1 copies of the seed set: intermediate
        states differ (mutation actually ran) and duplicates are rare at
        beta=1."""
        dim, _, _, _, lp, ll, ps = self._conjugate()
        s = SMCSampler(lp, ll, ps, n_particles=512, n_params=dim,
                       waste_free_k=3, seed=1)
        s.run()
        p = s.particles
        n_unique = len(np.unique(p.round(6), axis=0))
        assert n_unique > 0.5 * p.shape[0]

    def test_validation(self):
        dim, _, _, _, lp, ll, ps = self._conjugate()
        with pytest.raises(ValueError, match="divisible"):
            SMCSampler(lp, ll, ps, n_particles=100, n_params=dim,
                       waste_free_k=7)
        with pytest.raises(ValueError, match="even"):
            SMCSampler(lp, ll, ps, n_particles=12, n_params=dim,
                       waste_free_k=3)
        with pytest.raises(ValueError, match=">= 1"):
            SMCSampler(lp, ll, ps, n_particles=64, n_params=dim,
                       waste_free_k=0)

    def test_mesh_sharded_executes(self):
        from mcmcpp_tpu.parallel.mesh import make_walker_mesh

        dim, mu_n, s2, _, lp, ll, ps = self._conjugate()
        s = SMCSampler(lp, ll, ps, n_particles=1024, n_params=dim,
                       waste_free_k=3, seed=2, mesh=make_walker_mesh())
        s.run()
        assert float(s.state.beta) == 1.0
        p = s.particles
        np.testing.assert_allclose(p.mean(axis=0), [mu_n, mu_n], atol=0.12)


class TestMalaMutation:
    """Gradient (MALA) mutation kernel: same evidence/moment oracles as
    the ensemble mover, plus a higher-dim case where it matters."""

    def _model(self, dim):
        s2 = 1.0 / (1.0 / 4.0 + 1.0)
        logz = dim * (-0.5 * np.log(2 * np.pi * 5.0) - 0.5 / 5.0)

        def lp(t):
            return (-0.5 * jnp.sum(t**2) / 4.0
                    - dim / 2 * jnp.log(2 * jnp.pi * 4.0))

        def ll(t):
            return (-0.5 * jnp.sum((t - 1.0) ** 2)
                    - dim / 2 * jnp.log(2 * jnp.pi))

        def ps(key, n):
            return 2.0 * jax.random.normal(key, (n, dim))

        return lp, ll, ps, s2, logz

    def test_evidence_and_moments(self):
        lp, ll, ps, s2, logz = self._model(2)
        s = SMCSampler(lp, ll, ps, n_particles=2048, n_params=2,
                       n_mcmc=5, seed=0, mutation="mala")
        s.run()
        p = s.particles
        np.testing.assert_allclose(p.mean(0), [s2, s2], atol=0.08)
        np.testing.assert_allclose(p.var(0), [s2, s2], atol=0.12)
        assert s.log_evidence == pytest.approx(logz, abs=0.15)

    @pytest.mark.slow
    def test_higher_dim_evidence(self):
        dim = 16
        lp, ll, ps, s2, logz = self._model(dim)
        s = SMCSampler(lp, ll, ps, n_particles=4096, n_params=dim,
                       n_mcmc=8, seed=1, mutation="mala")
        s.run()
        assert s.log_evidence == pytest.approx(logz, abs=0.6)
        np.testing.assert_allclose(
            s.particles.mean(0), np.full(dim, s2), atol=0.1)

    def test_waste_free_mala(self):
        lp, ll, ps, s2, logz = self._model(2)
        s = SMCSampler(lp, ll, ps, n_particles=2048, n_params=2, seed=2,
                       mutation="mala", waste_free_k=7)
        s.run()
        assert s.log_evidence == pytest.approx(logz, abs=0.2)
        np.testing.assert_allclose(
            s.particles.mean(0), [s2, s2], atol=0.1)

    def test_unknown_mutation_rejected(self):
        lp, ll, ps, _, _ = self._model(2)
        with pytest.raises(ValueError, match="unknown mutation"):
            SMCSampler(lp, ll, ps, n_particles=64, n_params=2,
                       mutation="nuts")


class TestFlowMutation:
    """Normalizing-flow-preconditioned mutation (ROADMAP round-3 item):
    per-stage forward-KL flow refit + independence-MH proposals from the
    flow. Same conjugate oracles as the other kernels, plus the capability
    the mode exists for — mode-hopping on a well-separated bimodal target
    where local kernels cannot move mass between modes."""

    @staticmethod
    def _flow(dim):
        from mcmcpp_tpu.neutra import RealNVP

        return RealNVP(dim, n_layers=4, hidden=32)

    def _conjugate(self, dim):
        s2 = 1.0 / (1.0 / 4.0 + 1.0)
        logz = dim * (-0.5 * np.log(2 * np.pi * 5.0) - 0.5 / 5.0)

        def lp(t):
            return (-0.5 * jnp.sum(t**2) / 4.0
                    - dim / 2 * jnp.log(2 * jnp.pi * 4.0))

        def ll(t):
            return (-0.5 * jnp.sum((t - 1.0) ** 2)
                    - dim / 2 * jnp.log(2 * jnp.pi))

        def ps(key, n):
            return 2.0 * jax.random.normal(key, (n, dim))

        return lp, ll, ps, s2, logz

    def test_evidence_and_moments(self):
        lp, ll, ps, s2, logz = self._conjugate(2)
        s = SMCSampler(lp, ll, ps, n_particles=2048, n_params=2,
                       n_mcmc=5, seed=0, mutation="flow",
                       flow=self._flow(2))
        s.run()
        assert float(s.state.beta) == 1.0
        p = s.particles
        np.testing.assert_allclose(p.mean(0), [s2, s2], atol=0.08)
        np.testing.assert_allclose(p.var(0), [s2, s2], atol=0.12)
        assert s.log_evidence == pytest.approx(logz, abs=0.2)

    @staticmethod
    def _bimodal(tau=3.0, sep=3.0, sigma=0.6):
        """Prior N(0, tau²I); likelihood an equal two-Gaussian mixture at
        ±(sep, 0). Analytic evidence: Z = N((sep,0); 0, (tau²+sigma²)I)
        (the two symmetric convolution terms are equal)."""
        dim = 2
        m = np.array([sep, 0.0], np.float32)
        v = tau**2 + sigma**2
        logz = -np.log(2 * np.pi * v) - (sep**2) / (2 * v)

        def lp(t):
            return (-0.5 * jnp.sum(t**2) / tau**2
                    - dim / 2 * jnp.log(2 * jnp.pi * tau**2))

        def ll(t):
            d = dim / 2 * jnp.log(2 * jnp.pi * sigma**2)
            a = -0.5 * jnp.sum((t - m) ** 2) / sigma**2 - d
            b = -0.5 * jnp.sum((t + m) ** 2) / sigma**2 - d
            return jnp.logaddexp(a, b) - jnp.log(2.0)

        def ps(key, n):
            return tau * jax.random.normal(key, (n, dim))

        return dim, logz, lp, ll, ps

    def test_bimodal_mass_and_evidence(self):
        """Both modes populated with ~equal mass and the analytic log Z
        recovered — the global-move property local mutation kernels lack
        once the tempered modes separate."""
        dim, logz, lp, ll, ps = self._bimodal()
        s = SMCSampler(lp, ll, ps, n_particles=2048, n_params=dim,
                       n_mcmc=5, seed=3, mutation="flow",
                       flow=self._flow(dim), flow_fit_steps=200)
        s.run()
        assert float(s.state.beta) == 1.0
        p = s.particles
        right = float(np.mean(p[:, 0] > 0))
        assert 0.3 < right < 0.7, f"mode mass collapsed: right={right}"
        # particles sit in the modes, not between them
        assert np.mean(np.abs(np.abs(p[:, 0]) - 3.0) < 1.5) > 0.9
        assert s.log_evidence == pytest.approx(logz, abs=0.3)

    def test_waste_free_flow(self):
        lp, ll, ps, s2, logz = self._conjugate(2)
        s = SMCSampler(lp, ll, ps, n_particles=2048, n_params=2, seed=2,
                       mutation="flow", flow=self._flow(2),
                       waste_free_k=7)
        s.run()
        assert s.log_evidence == pytest.approx(logz, abs=0.2)
        np.testing.assert_allclose(s.particles.mean(0), [s2, s2], atol=0.1)

    def test_mesh_sharded_executes(self):
        from mcmcpp_tpu.parallel.mesh import make_walker_mesh

        lp, ll, ps, s2, _ = self._conjugate(2)
        s = SMCSampler(lp, ll, ps, n_particles=1024, n_params=2,
                       n_mcmc=4, seed=4, mutation="flow",
                       flow=self._flow(2), mesh=make_walker_mesh())
        s.run()
        assert float(s.state.beta) == 1.0
        np.testing.assert_allclose(s.particles.mean(0), [s2, s2], atol=0.12)


class TestHMCMutation:
    """mutation="hmc" (round-4 VERDICT item 7): fixed-shape ChEES-style
    HMC on the tempered target, same adaptive-SMC validity argument as
    MALA; evidence oracle + measured A/B vs MALA on the 10-D correlated
    Gaussian."""

    def _corr_model(self, dim=10, rho=0.5):
        """Prior N(0, 4I), likelihood N(1; theta, C) with equicorrelated
        C — evidence is the Gaussian convolution N(1; 0, C + 4I)."""
        c = rho * np.ones((dim, dim)) + (1 - rho) * np.eye(dim)
        lam = np.linalg.inv(c).astype(np.float32)
        y = np.ones(dim, np.float32)
        _, logdet_c = np.linalg.slogdet(c)
        marg = c + 4.0 * np.eye(dim)
        _, logdet_m = np.linalg.slogdet(marg)
        logz = float(
            -0.5 * y @ np.linalg.inv(marg) @ y
            - 0.5 * logdet_m - dim / 2 * np.log(2 * np.pi)
        )
        post_cov = np.linalg.inv(lam + np.eye(dim) / 4.0)
        post_mean = post_cov @ (lam @ y)

        def lp(t):
            return (-0.5 * jnp.sum(t * t) / 4.0
                    - dim / 2 * jnp.log(2 * jnp.pi * 4.0))

        def ll(t):
            d = t - jnp.asarray(y)
            return (-0.5 * d @ jnp.asarray(lam) @ d
                    - dim / 2 * np.log(2 * np.pi) - 0.5 * logdet_c)

        def ps(key, n):
            return 2.0 * jax.random.normal(key, (n, dim))

        return lp, ll, ps, logz, post_mean, post_cov

    def test_evidence_and_moments_10d_correlated(self):
        lp, ll, ps, logz, post_mean, post_cov = self._corr_model()
        s = SMCSampler(lp, ll, ps, n_particles=2048, n_params=10,
                       n_mcmc=3, seed=0, mutation="hmc")
        s.run()
        assert float(s.state.beta) == 1.0
        assert s.log_evidence == pytest.approx(logz, abs=0.35)
        np.testing.assert_allclose(
            s.particles.mean(0), post_mean, atol=0.1
        )
        np.testing.assert_allclose(
            s.particles.var(0), np.diag(post_cov), atol=0.15
        )

    @pytest.mark.slow
    def test_evidence_ab_vs_mala(self):
        """The VERDICT's A/B: over 4 seeds, HMC mutation's evidence
        error on the 10-D correlated Gaussian must be in MALA's class
        (within 2x of MALA's mean abs error) — it buys its hmc_steps-x
        gradient cost back in decorrelation, not accuracy regressions."""
        lp, ll, ps, logz, _, _ = self._corr_model()
        errs = {"mala": [], "hmc": []}
        for mutation in errs:
            for seed in range(4):
                s = SMCSampler(
                    lp, ll, ps, n_particles=1024, n_params=10,
                    n_mcmc=3, seed=seed, mutation=mutation,
                )
                s.run()
                errs[mutation].append(abs(s.log_evidence - logz))
        mala_err = float(np.mean(errs["mala"]))
        hmc_err = float(np.mean(errs["hmc"]))
        assert hmc_err < max(2.0 * mala_err, 0.3), (errs, logz)

    def test_waste_free_hmc(self):
        lp, ll, ps, logz, post_mean, _ = self._corr_model()
        s = SMCSampler(lp, ll, ps, n_particles=2048, n_params=10,
                       seed=2, mutation="hmc", waste_free_k=3,
                       hmc_steps=4)
        s.run()
        assert s.log_evidence == pytest.approx(logz, abs=0.4)
        np.testing.assert_allclose(s.particles.mean(0), post_mean,
                                   atol=0.15)

    def test_validation(self):
        lp, ll, ps, _, _, _ = self._corr_model(dim=2)
        with pytest.raises(ValueError, match="hmc_steps"):
            SMCSampler(lp, ll, ps, n_particles=64, n_params=2,
                       mutation="hmc", hmc_steps=0)

    def test_mesh_sharded_executes(self):
        from mcmcpp_tpu.parallel.mesh import make_walker_mesh

        lp, ll, ps, logz, _, _ = self._corr_model()
        s = SMCSampler(lp, ll, ps, n_particles=1024, n_params=10,
                       n_mcmc=2, seed=3, mutation="hmc",
                       mesh=make_walker_mesh())
        s.run()
        assert float(s.state.beta) == 1.0
        assert s.log_evidence == pytest.approx(logz, abs=0.5)
