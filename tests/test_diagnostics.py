"""Convergence diagnostics + PostStepAction hook tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import EnsembleSampler
from mcmcpp_tpu.analysis import (
    potential_scale_reduction, mcse_mean, summary, effective_sample_size,
)

from tests.targets import skewed_gaussian_logp


def test_rhat_converged_vs_not():
    rng = np.random.default_rng(0)
    good = rng.standard_normal((500, 8, 2))
    assert np.all(potential_scale_reduction(good) < 1.05)
    # chains stuck at different levels -> large rhat
    bad = good.copy()
    bad[:, :4, 0] += 10.0
    assert potential_scale_reduction(bad)[0] > 1.5
    assert potential_scale_reduction(bad)[1] < 1.05


def test_mcse_scales_with_sample_size():
    rng = np.random.default_rng(1)
    small = rng.standard_normal((200, 4, 1))
    big = rng.standard_normal((5000, 4, 1))
    assert mcse_mean(big)[0] < mcse_mean(small)[0]


def test_summary_keys_and_values():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1000, 8, 3)) + np.array([0.0, 5.0, -5.0])
    s = summary(x)
    np.testing.assert_allclose(s["mean"], [0, 5, -5], atol=0.1)
    np.testing.assert_allclose(s["sd"], 1.0, atol=0.05)
    assert np.all(s["rhat"] < 1.05)
    assert s["q5"].shape == (3,)
    assert np.all(s["q5"] < s["median"]) and np.all(s["median"] < s["q95"])


def test_rhat_on_real_sampler_run():
    s = EnsembleSampler(skewed_gaussian_logp, n_walkers=64, n_params=2, seed=3)
    s.init_ball(np.zeros(2), scale=0.5, seed=1)
    s.run_mcmc(300, store=False)
    s.run_mcmc(2000)
    rhat = potential_scale_reduction(s.get_samples())
    assert np.all(rhat < 1.05)


def test_step_action_hook():
    """PostStepAction equivalent: per-step jitted metric collection."""
    s = EnsembleSampler(skewed_gaussian_logp, n_walkers=32, n_params=2, seed=4)
    s.init_ball(np.zeros(2), scale=0.5, seed=2)

    def action(pos, logp):
        return {"mean": jnp.mean(pos, axis=0), "best": jnp.max(logp)}

    s.run_mcmc(100, step_action=action)
    m = s.step_metrics
    assert m["mean"].shape == (100, 2)
    assert m["best"].shape == (100,)
    # metric must agree with the stored chain
    np.testing.assert_allclose(
        m["mean"], s.get_samples().mean(axis=1), rtol=1e-5, atol=1e-6
    )


def test_chunk_action_hook():
    s = EnsembleSampler(
        skewed_gaussian_logp, n_walkers=32, n_params=2, seed=5,
        store_chunk_steps=25,
    )
    s.init_ball(np.zeros(2), scale=0.5, seed=3)
    seen = []
    s.run_mcmc(100, chunk_action=lambda chain: seen.append(chain.n_steps))
    assert seen == [25, 50, 75, 100]


def test_sampling_mode_alias():
    s = EnsembleSampler(skewed_gaussian_logp, n_walkers=16, n_params=2, seed=6)
    s.init_ball(np.zeros(2), scale=0.5, seed=4)
    s.set_sampling_mode(thin=5)
    s.run_mcmc(50)
    assert s.stored_steps == 10
