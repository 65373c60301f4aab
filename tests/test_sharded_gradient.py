"""Chains-axis sharding for gradient samplers + particle sharding for SMC."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import HMCSampler, NUTSSampler, SMCSampler
from mcmcpp_tpu.parallel.mesh import make_walker_mesh


def _logp(t):
    return -0.5 * jnp.sum(t * t)


@pytest.mark.slow
@pytest.mark.parametrize("cls", [HMCSampler, NUTSSampler])
def test_sharded_matches_unsharded(cls):
    """Sharded chains must be statistically equivalent (not bitwise: the
    adaptation reductions — mean accept prob, Welford moments — change
    float summation order under sharding)."""
    mesh = make_walker_mesh()
    kw = dict(n_chains=32, n_params=3, seed=0)
    a = cls(_logp, **kw)
    b = cls(_logp, mesh=mesh, **kw)
    for s in (a, b):
        s.init_ball(np.zeros(3), scale=1.0, seed=1)
        s.warmup(200)
        s.run(600)
    assert not b.state.position.sharding.is_fully_replicated
    fa = a.get_samples(burn_in=100, flat=True)
    fb = b.get_samples(burn_in=100, flat=True)
    np.testing.assert_allclose(fa.mean(0), fb.mean(0), atol=0.15)
    np.testing.assert_allclose(fa.var(0), fb.var(0), atol=0.25)
    assert b.step_size == pytest.approx(a.step_size, rel=0.5)


def test_sharded_chain_count_validation():
    mesh = make_walker_mesh()
    with pytest.raises(ValueError):
        HMCSampler(_logp, n_chains=10, n_params=2, mesh=mesh)


@pytest.mark.slow
def test_smc_sharded_particles():
    mesh = make_walker_mesh()
    dim = 2
    kw = dict(
        log_prior_fn=lambda t: -0.5 * jnp.sum(t * t) / 4.0,
        log_like_fn=lambda t: -0.5 * jnp.sum((t - 1.0) ** 2),
        prior_sample_fn=lambda k, n: 2.0 * jax.random.normal(k, (n, dim)),
        n_particles=512, n_params=dim, seed=0,
    )
    a = SMCSampler(**kw).run()
    b = SMCSampler(mesh=mesh, **kw).run()
    assert float(b.state.beta) == 1.0
    # reductions over the sharded particle axis reorder float sums, so the
    # adaptive ladder may differ in the last bits — compare statistically
    assert abs(a.n_stages - b.n_stages) <= 1
    assert a.log_evidence == pytest.approx(b.log_evidence, abs=0.1)
    np.testing.assert_allclose(
        a.particles.mean(0), b.particles.mean(0), atol=0.08
    )
