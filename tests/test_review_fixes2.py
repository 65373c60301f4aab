"""Regression tests for the second review pass."""

import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import (
    EnsembleSampler, HMCSampler, ParallelTemperingSampler, SMCSampler,
)
from mcmcpp_tpu.dsl import Model, Normal
from mcmcpp_tpu.io import load_checkpoint, save_checkpoint

from tests.targets import skewed_gaussian_logp


def test_checkpoint_extensionless_path_roundtrip(tmp_path):
    """np.savez appends .npz; save must return the REAL path and load must
    accept either spelling."""
    s = EnsembleSampler(skewed_gaussian_logp, 16, 2, seed=0)
    s.init_ball(np.zeros(2), scale=0.3, seed=1)
    s.run_mcmc(10)
    returned = save_checkpoint(s, tmp_path / "ck")  # no extension
    assert returned.exists() and returned.suffix == ".npz"
    for spec in (returned, tmp_path / "ck"):
        r = EnsembleSampler(skewed_gaussian_logp, 16, 2, seed=5)
        r.init_ball(np.ones(2), seed=2)
        load_checkpoint(r, spec)
        assert r.stored_steps == 10


def test_checkpoint_save_leaves_no_tmp(tmp_path):
    s = EnsembleSampler(skewed_gaussian_logp, 16, 2, seed=0)
    s.init_ball(np.zeros(2), scale=0.3, seed=1)
    s.run_mcmc(5)
    save_checkpoint(s, tmp_path / "a.npz")
    save_checkpoint(s, tmp_path / "a.npz")  # overwrite path also atomic
    assert sorted(p.name for p in tmp_path.iterdir()) == ["a.npz"]


def test_gradient_run_reports_capacity():
    row = 8 * 4 * 4  # C*(P+1)*itemsize
    s = HMCSampler(lambda t: -0.5 * jnp.sum(t * t), n_chains=8, n_params=3,
                   seed=0, n_leapfrog=4, max_chain_bytes=row * 7)
    s.init_ball(np.zeros(3), scale=1.0, seed=1)
    assert s.run(20) is False  # only 7 rows fit
    assert s.chain.n_steps == 7


def test_gradient_run_leftover_steps_advance_state():
    s = HMCSampler(lambda t: -0.5 * jnp.sum(t * t), n_chains=8, n_params=2,
                   seed=1, n_leapfrog=4)
    s.init_ball(np.zeros(2), scale=1.0, seed=2)
    before = np.asarray(s.state.position)
    assert s.run(5, thin=10) is True  # n_store == 0, leftover == 5
    assert s.chain.n_steps == 0
    assert not np.array_equal(before, np.asarray(s.state.position))
    assert s.last_mean_accept is not None
    assert not np.isnan(s.last_mean_accept)


def test_pt_run_reports_capacity():
    row = 16 * 3 * 4
    pt = ParallelTemperingSampler(
        skewed_gaussian_logp, n_walkers=16, n_params=2, n_temps=3, seed=0,
        max_chain_bytes=row * 5,
    )
    pt.init_ball(np.zeros(2), scale=0.3)
    assert pt.run_mcmc(20) is False
    assert pt.chain.n_steps == 5


def test_smc_warns_when_stages_exhausted():
    smc = SMCSampler(
        log_prior_fn=lambda t: -0.5 * jnp.sum(t * t) / 100.0,
        log_like_fn=lambda t: -0.5 * jnp.sum((t - 3) ** 2) * 1e4,
        prior_sample_fn=lambda k, n: 10.0 * jax.random.normal(k, (n, 2)),
        n_particles=128, n_params=2, seed=0, target_ess=0.9,
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        smc.run(max_stages=2)  # cannot reach beta=1 in 2 stages
    assert any("max_stages" in str(x.message) or "stalled" in str(x.message)
               for x in w)


def test_dsl_build_snapshot_isolated_from_later_params():
    m = Model().param("a", Normal(0.0, 1.0))
    logp, dim, _ = m.build()
    theta = jnp.asarray([0.7])
    before = float(logp(theta))
    m.param("b", Normal(5.0, 1.0))  # mutate AFTER build
    assert float(logp(theta)) == before  # old closure unaffected
    logp2, dim2, _ = m.build()
    assert dim2 == 2


def test_step_epoch_rebase_machinery():
    """Force a rebase and check counters + determinism survive."""
    s = EnsembleSampler(skewed_gaussian_logp, 16, 2, seed=0)
    s.init_ball(np.zeros(2), scale=0.3, seed=1)
    s.run_mcmc(30)
    # simulate a state that crossed the rebase threshold
    s.state = s.state._replace(step=jnp.asarray(1 << 30, jnp.int32))
    s._maybe_rebase_steps()
    assert s._step_epoch == 1
    assert int(s.state.step) == 0
    # total_steps still counts everything since the last reset
    assert s.total_steps == (1 << 30) * 16
    assert s.run_mcmc(10) is True  # sampling continues on the new epoch
    with pytest.raises(ValueError):
        s.run_mcmc((1 << 30) + 1)
