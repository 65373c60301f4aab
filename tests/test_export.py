"""ArviZ-dict export: shapes, naming via DSL, ordering round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import EnsembleSampler, NUTSSampler, to_inference_dict
from mcmcpp_tpu.dsl import HalfNormal, Model, Normal

from tests.targets import skewed_gaussian_logp


def test_flat_export_shapes_and_order():
    s = EnsembleSampler(skewed_gaussian_logp, 16, 2, seed=0)
    s.init_ball(np.zeros(2), scale=0.3)
    s.run_mcmc(50)
    d = to_inference_dict(s)
    assert set(d) == {"posterior", "sample_stats"}
    theta = d["posterior"]["theta"]
    assert theta.shape == (16, 50, 2)  # (chain, draw, param)
    assert d["sample_stats"]["lp"].shape == (16, 50)
    # ordering: chain c, draw t must equal samples[t, c]
    raw = s.get_samples()
    np.testing.assert_array_equal(theta[3, 7], raw[7, 3])
    # burn/thin plumbed through
    d2 = to_inference_dict(s, burn_in=10, thin=2)
    assert d2["posterior"]["theta"].shape == (16, 20, 2)


def test_named_export_via_model_with_ppc():
    data = np.array([1.0, 1.2, 0.8, 1.1])
    model = (
        Model()
        .param("mu", Normal(0.0, 5.0))
        .param("sigma", HalfNormal(2.0))
        .deterministic("cv", lambda p: p["sigma"] / p["mu"])
        .observe("y", lambda p: Normal(p["mu"], p["sigma"]), data)
    )
    logp, dim, _ = model.build()
    s = NUTSSampler(logp, n_chains=8, n_params=dim, seed=1)
    s.init_ball(np.zeros(dim), scale=0.2)
    s.warmup(100)
    s.run(60)
    ppc = model.posterior_predictive(
        jax.random.key(0), s.get_samples(flat=True)
    )
    d = to_inference_dict(s, model=model, posterior_predictive=ppc)
    assert set(d["posterior"]) == {"mu", "sigma", "cv"}
    assert d["posterior"]["mu"].shape == (8, 60)
    assert np.all(d["posterior"]["sigma"] > 0)  # constrained space
    np.testing.assert_allclose(
        d["posterior"]["cv"],
        d["posterior"]["sigma"] / d["posterior"]["mu"], rtol=1e-5,
    )
    assert d["posterior_predictive"]["y"].shape == (8, 60, 4)


def test_tempering_export():
    """ParallelTemperingSampler must export (get_log_probs regression)."""
    from mcmcpp_tpu import ParallelTemperingSampler

    s = ParallelTemperingSampler(skewed_gaussian_logp, n_walkers=16,
                                 n_params=2, n_temps=3, seed=0)
    s.init_ball(np.zeros(2), scale=0.3)
    s.run_mcmc(30)
    d = to_inference_dict(s)
    assert d["posterior"]["theta"].shape == (16, 30, 2)
    assert d["sample_stats"]["lp"].shape == (16, 30)


def test_nested_to_inference_dict():
    from mcmcpp_tpu import NestedSampler
    from mcmcpp_tpu.export import nested_to_inference_dict

    dim = 2

    def lp(t):
        return -0.5 * jnp.sum(t**2) / 4.0 - dim / 2 * jnp.log(
            2 * jnp.pi * 4.0)

    def ll(t):
        return -0.5 * jnp.sum((t - 1.0) ** 2) - dim / 2 * jnp.log(
            2 * jnp.pi)

    ns = NestedSampler(lp, ll, lambda k, n: 2.0 * jax.random.normal(
        k, (n, dim)), n_params=dim, n_live=300, n_mcmc=20, seed=0)
    ns.run()
    d = nested_to_inference_dict(ns, n_draws=3000, seed=1)
    post = d["posterior"]["theta"]
    assert post.shape == (1, 3000, dim)
    s2 = 1.0 / (1.0 / 4.0 + 1.0)
    np.testing.assert_allclose(post.mean((0, 1)), [s2, s2], atol=0.12)
    assert d["sample_stats"]["logz"].shape == (1, 3000)
    assert np.isfinite(d["sample_stats"]["log_likelihood"]).all()
    # result object works too; unfitted sampler is rejected
    d2 = nested_to_inference_dict(ns.result, n_draws=100)
    assert d2["posterior"]["theta"].shape == (1, 100, dim)
    ns2 = NestedSampler(lp, ll, lambda k, n: jax.random.normal(
        k, (n, dim)), n_params=dim, n_live=50)
    with pytest.raises(RuntimeError, match="run"):
        nested_to_inference_dict(ns2)
    with pytest.raises(TypeError, match="NestedSampler"):
        nested_to_inference_dict(42)


def test_ibis_export_groups():
    import jax

    from mcmcpp_tpu import IBISSampler
    from mcmcpp_tpu.export import ibis_to_inference_dict

    rng = np.random.default_rng(0)
    ys = (0.5 + rng.standard_normal(20)).astype(np.float32)
    s = IBISSampler(
        log_prior_fn=lambda t: -0.5 * t[0] ** 2 / 4.0,
        loglike_point_fn=lambda t, y: -0.5 * (y - t[0]) ** 2,
        prior_sample_fn=lambda key, n: 2.0 * jax.random.normal(key, (n, 1)),
        n_particles=512, n_params=1, batch_size=4, seed=0,
    )
    s.update(ys)
    d = ibis_to_inference_dict(s, n_draws=500, seed=1)
    assert d["posterior"]["theta"].shape == (1, 500, 1)
    assert d["sample_stats"]["log_evidence"].shape == (1, 500)
    trace = d["sample_stats"]["prequential_logp"][0]
    n_stages = len(s.log_evidence_trace)
    assert np.isfinite(trace[:n_stages]).all()
    assert np.isnan(trace[n_stages:]).all()
    with pytest.raises(TypeError, match="IBISSampler"):
        ibis_to_inference_dict(object())
