"""Regression tests for code-review findings (2026-08 review pass)."""

import numpy as np
import pytest

from mcmcpp_tpu import EnsembleSampler
from mcmcpp_tpu.chain import Chain
from mcmcpp_tpu.vi import ADVI
from mcmcpp_tpu import native

from tests.targets import skewed_gaussian_logp

import jax.numpy as jnp


def _sampler(**kw):
    s = EnsembleSampler(skewed_gaussian_logp, n_walkers=16, n_params=2,
                        seed=0, **kw)
    s.init_ball(np.zeros(2), scale=0.3, seed=1)
    return s


def test_reset_does_not_double_count_steps():
    s = _sampler()
    s.run_mcmc(100)
    s.reset()
    assert s._steps_host == 100
    s.run_mcmc(50)
    s.reset()
    assert s._steps_host == 150  # was 100 + 150 = 250 before the fix
    assert s.total_steps == 0


def test_negative_burnin_compact_backend_parity():
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((20, 4, 2)).astype(np.float32)
    logp = rng.standard_normal((20, 4)).astype(np.float32)
    chains = [Chain(4, 2, backend="numpy")]
    if native.available():
        chains.append(Chain(4, 2, backend="native"))
    outs = []
    for c in chains:
        c.append(pos, logp)
        c.compact(burn_in=-5, thin=2)
        outs.append(c.get())
    expect = pos[-5::2]
    for got in outs:
        np.testing.assert_array_equal(got, expect)


def test_chain_compact_rejects_bad_thin():
    c = Chain(4, 2, backend="numpy")
    with pytest.raises(ValueError):
        c.compact(thin=0)


def test_advi_sample_calls_are_fresh():
    vi = ADVI(lambda t: -0.5 * jnp.sum(t * t), n_params=2, seed=0)
    vi.fit(50)
    a, b = vi.sample(32), vi.sample(32)
    assert not np.array_equal(a, b)
    # explicit seed stays reproducible
    np.testing.assert_array_equal(vi.sample(8, seed=3), vi.sample(8, seed=3))


def test_huge_thin_micro_chunked_path():
    """thin > int32-safe launch size falls back to harvested micro-chunks."""
    s = _sampler()
    s._max_micro_updates = 16 * 8  # max_micro = 8 steps per launch
    s.run_mcmc(60, thin=20)  # thin(20) > max_micro(8) -> fallback path
    assert s.stored_steps == 3
    assert s.total_steps == 60 * 16
    assert 0 < s.accepted_steps <= 60 * 16
    # stored rows differ (sampling really advanced between stores)
    samples = s.get_samples()
    assert not np.allclose(samples[0], samples[-1])


def test_init_ball_stream_is_domain_separated():
    """Walker init draws from _aux_key, steps from _step_key — the two are
    split from the root key, so no step index can collide with the init
    stream (old scheme: fold_in(root, 0x1B17) == step 6935's key)."""
    import jax

    s = _sampler()
    step_data = np.asarray(jax.random.key_data(s._step_key))
    aux_data = np.asarray(jax.random.key_data(s._aux_key))
    assert not np.array_equal(step_data, aux_data)
    # and determinism across constructions is preserved
    s2 = _sampler()
    s.run_mcmc(20)
    s2.run_mcmc(20)
    np.testing.assert_array_equal(s.get_samples(), s2.get_samples())
