"""Power-scaling sensitivity (Kallioinen et al. 2023): conjugate
power-posterior oracle, conflict/healthy diagnosis, IS reliability.

Oracle: for prior N(0, 1) and likelihood Π N(y_i; θ, 1), the
prior-power-scaled posterior is N(ȳ·nα_l/(α_p + n), 1/(α_p + n)) in
closed form — the IS-reweighted moments must match it.
"""

import numpy as np
import pytest

from mcmcpp_tpu.analysis import (
    powerscale,
    powerscale_sensitivity,
)


@pytest.fixture(scope="module")
def conjugate():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(20) + 0.3
    n = 40000

    def posterior(alpha_prior=1.0, alpha_lik=1.0):
        prec = alpha_prior + alpha_lik * len(y)
        return alpha_lik * y.sum() / prec, 1.0 / np.sqrt(prec)

    mu0, sd0 = posterior()
    draws = (rng.standard_normal(n) * sd0 + mu0)[:, None]
    log_prior = -0.5 * draws[:, 0] ** 2
    log_lik = -0.5 * ((y[None, :] - draws[:, :1]) ** 2).sum(axis=1)
    return draws, log_prior, log_lik, posterior


class TestPowerScale:
    @pytest.mark.parametrize("alpha", [0.7, 1.5])
    def test_prior_scaling_matches_conjugate_oracle(self, conjugate,
                                                    alpha):
        draws, log_prior, _, posterior = conjugate
        r = powerscale(draws, log_prior, alpha)
        mu_a, sd_a = posterior(alpha_prior=alpha)
        assert r.mean[0] == pytest.approx(mu_a, abs=0.01)
        assert r.sd[0] == pytest.approx(sd_a, abs=0.01)
        assert r.pareto_k < 0.5  # mild perturbation: reliable IS

    def test_likelihood_scaling_matches_conjugate_oracle(self, conjugate):
        draws, _, log_lik, posterior = conjugate
        r = powerscale(draws, log_lik, 1.2)
        mu_a, sd_a = posterior(alpha_lik=1.2)
        assert r.mean[0] == pytest.approx(mu_a, abs=0.015)
        assert r.sd[0] == pytest.approx(sd_a, abs=0.015)

    def test_alpha_one_is_identity(self, conjugate):
        draws, log_prior, _, _ = conjugate
        r = powerscale(draws, log_prior, 1.0)
        assert r.mean[0] == pytest.approx(draws.mean(), abs=1e-9)
        assert np.all(r.distance < 1e-4)

    def test_validation(self, conjugate):
        draws, log_prior, log_lik, _ = conjugate
        with pytest.raises(ValueError, match="log_comp"):
            powerscale(draws, log_prior[:-1], 1.1)
        with pytest.raises(ValueError, match="alpha"):
            powerscale_sensitivity(draws, log_prior, log_lik, alpha=0.99)


class TestSensitivityDiagnosis:
    def test_weak_prior_reads_likelihood_driven(self, conjugate):
        draws, log_prior, log_lik, _ = conjugate
        s = powerscale_sensitivity(draws, log_prior, log_lik)
        assert s.prior[0] < s.threshold
        assert s.likelihood[0] >= s.threshold
        assert s.diagnosis == ["likelihood-driven (healthy)"]

    def test_prior_data_conflict_detected(self):
        """Strong prior at -3 vs data at +3: BOTH components move the
        posterior — the conflict signature."""
        rng = np.random.default_rng(1)
        y = rng.standard_normal(20) * 0.5 + 3.0
        prec = 25 + 20 / 0.25
        mu = (25 * (-3.0) + y.sum() / 0.25) / prec
        draws = (rng.standard_normal(40000) / np.sqrt(prec) + mu)[:, None]
        lp = -0.5 * 25 * (draws[:, 0] + 3.0) ** 2
        ll = -0.5 * ((y[None, :] - draws[:, :1]) ** 2 / 0.25).sum(axis=1)
        s = powerscale_sensitivity(draws, lp, ll)
        assert s.diagnosis == ["prior-data conflict"]
        assert s.prior[0] > 10 * s.threshold
        assert s.likelihood[0] > 10 * s.threshold

    def test_dsl_build_split_integration(self):
        """The DSL already exposes exactly the per-draw totals this
        module consumes (Model.build_split)."""
        import jax

        from mcmcpp_tpu.dsl import Model, Normal

        y = np.asarray([0.4, 0.6, 0.2, 0.5], np.float32)
        m = Model().param("mu", Normal(0.0, 1.0))
        m.observe("y", lambda p: Normal(p["mu"], 0.5), y)
        logprior, loglik, _, _, _ = m.build_split()
        rng = np.random.default_rng(2)
        draws = rng.standard_normal((2000, 1)) * 0.23 + 0.4
        lp = np.asarray(jax.vmap(logprior)(draws.astype(np.float32)))
        ll = np.asarray(jax.vmap(loglik)(draws.astype(np.float32)))
        s = powerscale_sensitivity(draws, lp, ll)
        assert len(s.diagnosis) == 1
        assert np.isfinite(s.prior).all() and np.isfinite(s.likelihood).all()
