"""Gradient-based samplers (HMC / NUTS / MALA): statistical correctness.

Oracle pattern follows the reference's test strategy (SURVEY.md §4): targets
with analytically known moments, checked within Monte-Carlo error.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu.gradient import (
    BarkerSampler, CheesHMCSampler, HMCSampler, MALASampler, NUTSSampler,
)
from mcmcpp_tpu.gradient.chees import halton2

from tests.targets import correlated_gaussian_logp_factory


DIM = 4
RHO = 0.5


def _target():
    logp, cov = correlated_gaussian_logp_factory(dim=DIM, rho=RHO)
    return logp, np.asarray(cov)


def _run(cls, seed=0, warmup=300, steps=1500, **kw):
    logp, cov = _target()
    s = cls(logp, n_chains=32, n_params=DIM, seed=seed, **kw)
    s.init_ball(np.zeros(DIM), scale=1.0, seed=seed + 1)
    s.warmup(warmup)
    s.run(steps)
    return s, cov


@pytest.mark.parametrize("cls,kw", [
    (HMCSampler, {"n_leapfrog": 12}),
    (MALASampler, {}),
    (BarkerSampler, {}),
    (NUTSSampler, {"max_depth": 8}),
    (CheesHMCSampler, {}),
])
def test_moments(cls, kw):
    s, cov = _run(cls, **kw)
    flat = s.get_samples(burn_in=100, flat=True)
    mean = flat.mean(axis=0)
    emp_cov = np.cov(flat.T)
    np.testing.assert_allclose(mean, np.zeros(DIM), atol=0.15)
    np.testing.assert_allclose(emp_cov, cov, atol=0.3)


def test_hmc_step_size_adapts_toward_target():
    s, _ = _run(HMCSampler, n_leapfrog=12)
    # post-warmup acceptance should be in a sane band around the 0.8 target
    assert 0.5 < s.last_mean_accept < 0.99
    import numpy as _np
    assert _np.all(_np.asarray(s.step_size) > 1e-3)


def test_mass_matrix_adaptation_learns_scales():
    """Anisotropic Gaussian: adapted inv_mass ≈ marginal variances."""
    scales = jnp.asarray([0.1, 1.0, 10.0], jnp.float32)

    def logp(theta):
        return -0.5 * jnp.sum((theta / scales) ** 2)

    s = HMCSampler(logp, n_chains=32, n_params=3, seed=2, n_leapfrog=16)
    s.init_ball(np.zeros(3), scale=1.0, seed=3)
    s.warmup(800)
    ratio = np.asarray(s.inv_mass) / np.asarray(scales) ** 2
    # each adapted variance within ~3x of truth (wide MC tolerance)
    assert np.all(ratio > 0.2) and np.all(ratio < 5.0)


def test_nuts_moves_every_chain():
    logp, _ = _target()
    s = NUTSSampler(logp, n_chains=8, n_params=DIM, seed=5, max_depth=6)
    s.init_ball(np.zeros(DIM), scale=1.0, seed=6)
    before = np.asarray(s.state.position)
    s.warmup(50)
    s.run(50)
    after = np.asarray(s.state.position)
    assert np.all(np.any(before != after, axis=1))


def test_deterministic_given_seed():
    s1, _ = _run(HMCSampler, seed=9, warmup=50, steps=100, n_leapfrog=8)
    s2, _ = _run(HMCSampler, seed=9, warmup=50, steps=100, n_leapfrog=8)
    np.testing.assert_array_equal(s1.get_samples(), s2.get_samples())


# -- ChEES-HMC specifics ------------------------------------------------------


def test_halton_low_discrepancy():
    """Base-2 van der Corput: any prefix of length 2^k hits each of the 2^k
    uniform bins exactly once (the defining property)."""
    u = np.asarray(halton2(jnp.arange(64, dtype=jnp.int32)))
    assert np.all((u > 0) & (u < 1))
    for k in (8, 16, 32, 64):
        bins = np.floor(u[:k] * k).astype(int)
        assert sorted(bins) == list(range(k)), (k, sorted(bins))


def test_chees_trajectory_adapts_up_for_wide_target():
    """Unwhitened anisotropic Gaussian (mass adaptation off): optimal
    trajectory ~ (pi/2)*sigma_max >> one step, so adapted T must grow to
    several leapfrog steps (cf. Hoffman et al. 2021 fig. 2)."""
    scales = jnp.linspace(1.0, 5.0, 8)

    def logp(t):
        return -0.5 * jnp.sum((t / scales) ** 2)

    s = CheesHMCSampler(logp, n_chains=64, n_params=8, seed=3, step_size=0.1)
    s.init_ball(np.zeros(8), scale=1.0, seed=4)
    s.warmup(600, adapt_mass=False)
    eps = float(np.asarray(s.step_size))
    assert s.traj_length > 2 * eps, (s.traj_length, eps)
    assert 2.0 < s.traj_length < 25.0, s.traj_length
    s.run(800)
    flat = s.get_samples(flat=True)
    np.testing.assert_allclose(
        flat.std(axis=0), np.asarray(scales), rtol=0.15
    )


def test_chees_deterministic_given_seed():
    s1, _ = _run(CheesHMCSampler, seed=11, warmup=60, steps=100)
    s2, _ = _run(CheesHMCSampler, seed=11, warmup=60, steps=100)
    assert s1.traj_length == s2.traj_length
    np.testing.assert_array_equal(s1.get_samples(), s2.get_samples())


def test_chees_continuous_adapt_moments():
    """Diminishing-adaptation sampling (Roberts & Rosenthal 2007) must
    leave the stationary distribution intact."""
    s, cov = _run(CheesHMCSampler, continuous_adapt=True)
    flat = s.get_samples(burn_in=100, flat=True)
    np.testing.assert_allclose(flat.mean(axis=0), np.zeros(DIM), atol=0.15)
    np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.3)


def test_chees_continuous_adapt_recovers_from_short_warmup():
    """Start sampling with a deliberately bad (tiny) trajectory: the
    in-sampling ascent must grow T toward the warmup-quality optimum."""
    scales = jnp.linspace(1.0, 5.0, 8)

    def logp(t):
        return -0.5 * jnp.sum((t / scales) ** 2)

    s = CheesHMCSampler(logp, n_chains=64, n_params=8, seed=3,
                        step_size=0.25, init_traj_length=0.3,
                        continuous_adapt=True)
    s.init_ball(np.zeros(8), scale=1.0, seed=4)
    t0 = s.current_traj_length()
    s.run(1200)
    t1 = s.current_traj_length()
    assert t1 > 3.0 * t0, (t0, t1)
    # diminishing rate: a further run moves log T far less than the first
    s.run(1200)
    t2 = s.current_traj_length()
    assert abs(np.log(t2 / t1)) < 0.5 * abs(np.log(t1 / t0)), (t0, t1, t2)


def test_chees_continuous_adapt_deterministic():
    s1, _ = _run(CheesHMCSampler, seed=11, warmup=60, steps=100,
                 continuous_adapt=True)
    s2, _ = _run(CheesHMCSampler, seed=11, warmup=60, steps=100,
                 continuous_adapt=True)
    assert s1.current_traj_length() == s2.current_traj_length()
    np.testing.assert_array_equal(s1.get_samples(), s2.get_samples())


def test_chees_rewarmup_resets_continuous_adapt():
    logp, _ = _target()
    s = CheesHMCSampler(logp, n_chains=8, n_params=DIM, seed=7,
                        continuous_adapt=True)
    s.init_ball(np.zeros(DIM), scale=1.0, seed=8)
    s.warmup(40)
    s.run(50)
    assert s._sadapt is not None
    s.warmup(40)
    assert s._sadapt is None  # next run restarts from the new warmup T


def test_chees_rewarmup_invalidates_run_cache():
    """run() programs bake the trajectory length in at trace time; a second
    warmup must not leave stale compiled programs behind."""
    logp, _ = _target()
    s = CheesHMCSampler(logp, n_chains=8, n_params=DIM, seed=7)
    s.init_ball(np.zeros(DIM), scale=1.0, seed=8)
    s.warmup(40)
    s.run(20)
    assert s._run_cache
    s.warmup(40)
    assert not s._run_cache
