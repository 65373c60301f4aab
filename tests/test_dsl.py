"""Log-prob DSL: transforms, priors, conjugate posterior recovery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import EnsembleSampler, NUTSSampler, SMCSampler
from mcmcpp_tpu.dsl import (
    Beta, Exp, Exponential, Gamma, HalfNormal, LogNormal, Model, Normal,
    Sigmoid, Uniform,
)


def test_transform_round_trips():
    u = jnp.linspace(-3, 3, 11)
    for t in [Exp(), Sigmoid(-2.0, 5.0)]:
        np.testing.assert_allclose(t.inverse(t.forward(u)), u, atol=1e-5)


def test_transform_jacobian_matches_autodiff():
    for t in [Exp(), Sigmoid(0.0, 1.0)]:
        for u in [-1.2, 0.3, 2.0]:
            grad = jax.grad(lambda v: t.forward(v))(jnp.float32(u))
            np.testing.assert_allclose(
                float(t.log_det(jnp.float32(u))), float(jnp.log(grad)),
                atol=1e-5,
            )


@pytest.mark.parametrize("dist,mean,var", [
    (Normal(2.0, 3.0), 2.0, 9.0),
    (HalfNormal(1.0), np.sqrt(2 / np.pi), 1 - 2 / np.pi),
    (Exponential(2.0), 0.5, 0.25),
    (Gamma(3.0, 2.0), 1.5, 0.75),
    (Beta(2.0, 5.0), 2 / 7, 2 * 5 / (49 * 8)),
    (Uniform(-1.0, 3.0), 1.0, 16 / 12),
    (LogNormal(0.0, 0.5), np.exp(0.125), (np.exp(0.25) - 1) * np.exp(0.25)),
])
def test_distribution_samples_match_moments(dist, mean, var):
    x = np.asarray(dist.sample(jax.random.key(0), (200_000,)))
    assert x.mean() == pytest.approx(mean, abs=4 * np.sqrt(var / 2e5) + 1e-3)
    assert x.var() == pytest.approx(var, rel=0.05)


def test_prior_only_model_sampling():
    """Sampling a prior-only model must recover the prior (transform
    Jacobians correct)."""
    model = Model().param("s", HalfNormal(2.0)).param("p", Beta(2.0, 2.0))
    logp, dim, constrain = model.build()
    assert dim == 2
    s = NUTSSampler(logp, n_chains=32, n_params=dim, seed=0, max_depth=6)
    s.init_ball(np.zeros(dim), scale=0.5, seed=1)
    s.warmup(300)
    s.run(1500)
    draws = constrain(s.get_samples(burn_in=100, flat=True))
    assert draws["s"].min() > 0
    assert 0 < draws["p"].min() and draws["p"].max() < 1
    assert draws["s"].mean() == pytest.approx(2.0 * np.sqrt(2 / np.pi),
                                              rel=0.1)
    assert draws["p"].mean() == pytest.approx(0.5, abs=0.03)


def test_conjugate_normal_posterior():
    """Known-posterior check: N(mu, 1) likelihood, N(0, 10²) prior."""
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(3.0, 1.0, 50).astype(np.float32))
    model = (
        Model()
        .param("mu", Normal(0.0, 10.0))
        .likelihood(lambda p: jnp.sum(Normal(p["mu"], 1.0).logpdf(data)))
    )
    logp, dim, constrain = model.build()
    # analytic posterior
    prec = 1 / 100 + 50
    post_mean = float(jnp.sum(data)) / prec
    s = EnsembleSampler(logp, n_walkers=64, n_params=dim, seed=2)
    s.init_ball(np.zeros(dim), scale=1.0, seed=3)
    s.run_mcmc(300, store=False)
    s.run_mcmc(3000)
    mu = constrain(s.get_samples(flat=True))["mu"]
    assert mu.mean() == pytest.approx(post_mean, abs=0.05)
    assert mu.var() == pytest.approx(1 / prec, rel=0.2)


def test_vector_params_and_smc_integration():
    model = (
        Model()
        .param("w", Normal(0.0, 1.0), shape=(3,))
        .param("noise", HalfNormal(1.0))
    )
    logp, dim, constrain = model.build()
    assert dim == 4
    u = model.prior_sample(jax.random.key(0), 256)
    assert u.shape == (256, 4)
    smc = SMCSampler(
        log_prior_fn=logp,
        log_like_fn=lambda t: 0.0,
        prior_sample_fn=model.prior_sample,
        n_particles=256, n_params=dim, seed=1,
    )
    smc.run()
    draws = constrain(smc.particles)
    assert draws["w"].shape == (256, 3)
    assert draws["noise"].min() > 0


def test_duplicate_param_rejected():
    with pytest.raises(ValueError):
        Model().param("a", Normal()).param("a", Normal())
