"""Parallel tempering: exchange correctness + multimodal mixing."""

import numpy as np
import jax.numpy as jnp
import pytest

from mcmcpp_tpu.tempering import (
    ParallelTemperingSampler, geometric_ladder,
)
from mcmcpp_tpu.models import gaussian_mixture

from tests.targets import skewed_gaussian_logp, skewed_gaussian_cov


def test_ladder_shape_and_bounds():
    b = np.asarray(geometric_ladder(6, beta_min=0.05))
    assert b.shape == (6,)
    assert b[0] == 1.0 and b[-1] == pytest.approx(0.05)
    assert np.all(np.diff(b) < 0)


def test_bad_ladder_rejected():
    with pytest.raises(ValueError):
        ParallelTemperingSampler(
            skewed_gaussian_logp, 16, 2, betas=[0.5, 0.1]
        )


def test_cold_chain_targets_posterior():
    """β=1 replica must reproduce the skewed-Gaussian covariance even with
    the ladder machinery running."""
    s = ParallelTemperingSampler(
        skewed_gaussian_logp, n_walkers=64, n_params=2, n_temps=4, seed=0,
        swap_every=2,
    )
    s.init_ball(np.zeros(2), scale=0.5)
    s.run_mcmc(3000)
    cov = np.cov(s.get_samples(burn_in=300, flat=True).T)
    np.testing.assert_allclose(cov, skewed_gaussian_cov(), atol=0.15)
    rates = s.swap_acceptance
    assert rates.shape == (3,)
    assert np.all(rates > 0.05)  # adjacent temps actually exchange


def test_tempering_mixes_separated_modes():
    """Widely separated modes: plain stretch at β=1 cannot cross, the
    tempered ladder can. Cold chain must populate both modes."""
    t = gaussian_mixture([[-8.0], [8.0]], scales=[0.5, 0.5])
    s = ParallelTemperingSampler(
        t.logp, n_walkers=64, n_params=1, n_temps=8, seed=1,
        betas=np.geomspace(1.0, 0.005, 8), swap_every=1,
    )
    # start ALL walkers in the left mode — only exchange moves can seed the
    # right mode in the cold chain
    s.init_ball(np.array([-8.0]), scale=0.5)
    s.run_mcmc(4000)
    flat = s.get_samples(burn_in=1000, flat=True)[:, 0]
    frac_right = (flat > 0).mean()
    assert 0.2 < frac_right < 0.8  # both modes populated
    np.testing.assert_allclose(flat.mean(), 0.0, atol=1.6)
