"""emcee-compat shim: surface parity and statistical correctness."""

import numpy as np
import jax.numpy as jnp
import pytest

from mcmcpp_tpu.compat.emcee import EnsembleSampler, State
from mcmcpp_tpu.movers import DESnookerMove, StretchMove

from tests.targets import skewed_gaussian_cov, skewed_gaussian_logp


def test_emcee_workflow_end_to_end():
    rng = np.random.default_rng(0)
    nwalkers, ndim = 100, 2
    s = EnsembleSampler(nwalkers, ndim, skewed_gaussian_logp, seed=5)
    p0 = rng.normal(scale=0.3, size=(nwalkers, ndim))
    state = s.run_mcmc(p0, 500, store=False)
    assert isinstance(state, State)
    assert state.coords.shape == (nwalkers, ndim)
    assert state.log_prob.shape == (nwalkers,)
    # continue from current state, emcee-style None
    s.run_mcmc(None, 4000)
    chain = s.get_chain(discard=500, flat=True)
    np.testing.assert_allclose(
        np.cov(chain.T), skewed_gaussian_cov(), atol=0.15
    )
    lp = s.get_log_prob(discard=500)
    assert lp.shape[0] == s.get_chain(discard=500).shape[0]
    af = s.acceptance_fraction
    assert af.shape == (nwalkers,)
    assert 0.3 < af.mean() < 0.95
    tau = s.get_autocorr_time(discard=500)
    assert tau.shape == (ndim,) and np.all(tau > 0)


def test_args_kwargs_partial_application():
    def logp(theta, scale, offset=0.0):
        return -0.5 * ((theta[0] - offset) / scale) ** 2

    s = EnsembleSampler(32, 1, logp, args=(2.0,), kwargs={"offset": 1.0})
    s.run_mcmc(np.random.default_rng(1).normal(size=(32, 1)), 2000)
    flat = s.get_chain(discard=300, flat=True)
    assert abs(flat.mean() - 1.0) < 0.3
    assert abs(flat.std() - 2.0) < 0.4


def test_moves_list_maps_to_mixture():
    s = EnsembleSampler(
        64, 2, skewed_gaussian_logp,
        moves=[(StretchMove(a=2.0), 0.7), (DESnookerMove(), 0.3)],
    )
    s.run_mcmc(np.random.default_rng(2).normal(size=(64, 2)), 1500)
    assert s.get_chain().shape[0] == 1500
    # single bare move also accepted
    s2 = EnsembleSampler(64, 2, skewed_gaussian_logp, moves=[StretchMove()])
    s2.run_mcmc(np.random.default_rng(3).normal(size=(64, 2)), 10)


def test_autocorr_time_raises_when_too_short():
    s = EnsembleSampler(32, 2, skewed_gaussian_logp)
    s.run_mcmc(np.random.default_rng(4).normal(size=(32, 2)), 60)
    # 60 stored steps << 50*tau (tau ~ 5-7): emcee's length criterion
    with pytest.raises(RuntimeError, match="shorter than"):
        s.get_autocorr_time()
    tau = s.get_autocorr_time(quiet=True)
    assert np.all(tau > 0)  # quiet path returns |tau|


def test_thin_by_scales_tau_units():
    s = EnsembleSampler(64, 1, lambda t: -0.5 * t[0] ** 2, seed=9)
    s.run_mcmc(np.random.default_rng(5).normal(size=(64, 1)), 500, thin_by=4)
    # 500 stored rows, each 4 raw steps apart
    assert s.get_chain().shape == (500, 64, 1)
    assert s.run_mcmc(None, 10) is not None


def test_blobs_roundtrip():
    """emcee blob channel: (lp, blob, ...) log_prob_fn; get_blobs
    recomputes deterministically from the stored chain."""
    from mcmcpp_tpu.compat.emcee import EnsembleSampler

    def logp_with_blobs(t):
        lp = -0.5 * jnp.sum(t * t)
        return lp, jnp.sum(t), t * 2.0  # scalar blob + vector blob

    s = EnsembleSampler(16, 2, logp_with_blobs, seed=0)
    s.run_mcmc(np.random.default_rng(0).normal(size=(16, 2)), 30)
    chain = s.get_chain()
    b_sum, b_vec = s.get_blobs()
    assert b_sum.shape == (30, 16)
    assert b_vec.shape == (30, 16, 2)
    np.testing.assert_allclose(b_sum, chain.sum(-1), rtol=1e-5)
    np.testing.assert_allclose(b_vec, 2.0 * chain, rtol=1e-6)
    # flat + discard/thin plumbing
    bf = s.get_blobs(discard=10, thin=2, flat=True)
    assert bf[0].shape == (10 * 16,)
    # single blob returns a bare array; no blobs returns None
    init = np.random.default_rng(5).normal(size=(16, 2))
    s1 = EnsembleSampler(
        16, 2, lambda t: (-0.5 * jnp.sum(t * t), t[0]), seed=7)
    s1.run_mcmc(init, 5)
    assert s1.get_blobs().shape == (5, 16)
    s0 = EnsembleSampler(16, 2, lambda t: -0.5 * jnp.sum(t * t), seed=7)
    s0.run_mcmc(init, 5)
    assert s0.get_blobs() is None
    # SAME seed, SAME (non-degenerate) init: the blob channel must not
    # perturb the sampling path at all — chains bitwise identical
    np.testing.assert_array_equal(s0.get_chain(), s1.get_chain())
    np.testing.assert_array_equal(s0.get_log_prob(), s1.get_log_prob())


def test_dram_move_through_facade():
    """DRAMMove (movers/dram.py) is a drop-in emcee move."""
    from mcmcpp_tpu import DRAMMove

    s = EnsembleSampler(64, 2, skewed_gaussian_logp, moves=[DRAMMove()])
    s.run_mcmc(np.random.default_rng(5).normal(size=(64, 2)), 200)
    assert s.get_chain().shape == (200, 64, 2)
    assert np.isfinite(s.get_log_prob()).all()


def test_sample_generator_matches_emcee_surface():
    """emcee's `for state in sampler.sample(...)` loop works verbatim:
    one State per (thinned) iteration, chain rows accumulate, and the
    final state continues from the generator's last yield."""
    s = EnsembleSampler(32, 2, skewed_gaussian_logp)
    init = np.random.default_rng(6).normal(size=(32, 2))
    seen = []
    for state in s.sample(init, iterations=5, thin_by=2):
        assert state.coords.shape == (32, 2)
        assert np.isfinite(state.log_prob).all()
        seen.append(state.coords.copy())
    assert len(seen) == 5
    assert s.get_chain().shape == (5, 32, 2)
    # chain rows are exactly the yielded states
    np.testing.assert_array_equal(s.get_chain()[-1], seen[-1])
    # continuation without initial_state picks up where we left off
    next(iter(s.sample(iterations=1)))
    assert s.get_chain().shape == (6, 32, 2)
    # store=False advances without touching the chain
    for _ in s.sample(iterations=2, store=False):
        pass
    assert s.get_chain().shape == (6, 32, 2)
